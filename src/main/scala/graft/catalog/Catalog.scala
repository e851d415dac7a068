package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Lakehouse namespace: `layer.table` → path, with snapshot-semantics
  * overwrite (SURVEY.md §1.1).
  *
  * The reference's namespace is three ADLS containers (`abfss://bronze@…`,
  * `abfss://silver@…`, `abfss://gold@…` — Bronze_Layer.py:35,
  * Silver_Customers.py:41, Gold_Orders.py:20) plus Unity-Catalog 3-part
  * names. Here the same shape is `<warehouse>/{bronze,silver,gold}/<table>`
  * over any Hadoop filesystem.
  *
  * Snapshot swap (SURVEY §7.3): an overwrite writes to `<table>.tmp`, then
  * retires current into the version log `<table>.history/v{N}` and renames
  * tmp → current. On HDFS/local FS rename is atomic per directory move, so
  * a reader resolving the path either sees the old or the new snapshot,
  * never a half-written one. (On S3-like stores a manifest-pointer commit
  * would replace the rename pair — same protocol, different primitive.)
  *
  * Time travel (Delta `VERSION AS OF`, Gold_Customers.py:105 context): the
  * version log keeps the last `keepVersions` retired snapshots; the live
  * snapshot's version number is recorded in `<table>.history/_current`
  * AFTER the swap completes, so a crash mid-swap leaves the pointer on the
  * old version — whose data is intact in the log — and never names a
  * half-committed state.
  */
class Catalog(spark: SparkSession, warehouse: String,
    val keepVersions: Int = 10) {
  val layers: Seq[String] = Seq("bronze", "silver", "gold")

  def path(layer: String, table: String): String = s"$warehouse/$layer/$table"

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(layer: String, table: String): Boolean =
    fs.exists(new Path(path(layer, table)))

  def read(layer: String, table: String): DataFrame =
    graft.layout.DeletionVectors.readPath(spark, path(layer, table))

  /** The live snapshot's version number (1-based; 0 = table absent). */
  def currentVersion(layer: String, table: String): Int =
    Catalog.readPointer(fs, path(layer, table))

  /** Version-addressed read (Delta `VERSION AS OF`): the live version reads
    * the current dir, older versions read the retained log entry. */
  def readVersion(layer: String, table: String, v: Int): DataFrame =
    graft.layout.DeletionVectors.readPath(spark,
      Catalog.resolveVersionPath(spark, path(layer, table), v))

  /** Timestamp-addressed read (Delta `TIMESTAMP AS OF`): the newest version
    * committed at or before `ts`. */
  def readTimestamp(layer: String, table: String, ts: java.sql.Timestamp)
      : DataFrame =
    graft.layout.DeletionVectors.readPath(spark,
      Catalog.resolveTimestampPath(spark, path(layer, table), ts.getTime))

  /** Versions currently readable: the retained log entries + the live one.
    * One `listStatus` of the (bounded) history dir — NOT an existence
    * probe per historical version number, which would grow with table age. */
  def listVersions(layer: String, table: String): Seq[Int] = {
    val cur = currentVersion(layer, table)
    if (cur == 0) Nil
    else {
      val hist = Catalog.historyDir(path(layer, table))
      val logged =
        if (!fs.exists(hist)) Nil
        else fs.listStatus(hist).map(_.getPath.getName)
          .filter(n => n.startsWith("v") && n.drop(1).nonEmpty &&
            n.drop(1).forall(_.isDigit))
          .map(_.drop(1).toInt).filter(_ < cur).sorted.toSeq
      logged :+ cur
    }
  }

  /** `DESCRIBE HISTORY` equivalent: one row per readable version with its
    * commit time and physical footprint. Driver-side listing, bounded by
    * `keepVersions` (file sizes are summed one directory level deep —
    * partitioned snapshots report their top-level footprint). The SQL
    * surface (`DESCRIBE HISTORY <table>` via graft.sql) shares
    * [[Catalog.historyRows]]. */
  def history(layer: String, table: String): DataFrame = {
    import spark.implicits._
    Catalog.historyRows(spark, path(layer, table))
      .toDF("version", "is_current", "snapshot_time", "num_entries",
        "size_bytes", "operation").orderBy(col("version").desc)
  }

  /** The snapshot replaced by the most recent overwrite. Falls back to the
    * pre-version-log single-depth `.prev` layout so warehouses written by
    * an older engine stay readable. */
  def readPrevious(layer: String, table: String): DataFrame = {
    val cur = currentVersion(layer, table)
    if (cur > 1 && fs.exists(Catalog.versionDir(path(layer, table), cur - 1)))
      readVersion(layer, table, cur - 1)
    else graft.layout.DeletionVectors.readPath(spark,
      path(layer, table) + ".prev")
  }

  def hasPrevious(layer: String, table: String): Boolean = {
    val cur = currentVersion(layer, table)
    (cur > 1 && fs.exists(Catalog.versionDir(path(layer, table), cur - 1))) ||
      fs.exists(new Path(path(layer, table) + ".prev")) // legacy layout
  }

  /** First-load create (the reference's `saveAsTable` path,
    * Gold_Customers.py:65-68). */
  def create(df: DataFrame, layer: String, table: String,
      partitionBy: Seq[String] = Nil): Unit = {
    // constraints/identity recorded before first load (or surviving a
    // DROP + recreate) apply to the initial data too
    val dfId = Catalog.fillIdentityColumns(spark, df, path(layer, table), fs)
    val cons = Catalog.readConstraintsPath(spark, path(layer, table))
    if (cons.nonEmpty) Catalog.enforce(dfId, cons, path(layer, table))
    val w = dfId.write.mode(SaveMode.ErrorIfExists)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(layer, table))
  }

  /** Snapshot overwrite with atomic swap (replaces Delta's transactional
    * overwrite, Silver_Customers.py:41). Schema-on-write is STRICT like
    * Delta's: a frame whose columns/types differ from the live snapshot is
    * rejected unless `allowSchemaChange` (Delta's `overwriteSchema`). */
  def overwriteSnapshot(df: DataFrame, layer: String, table: String,
      partitionBy: Seq[String] = Nil,
      allowSchemaChange: Boolean = false,
      commitTag: Option[(String, String)] = None): Unit = {
    Catalog.overwritePath(spark, df, path(layer, table), partitionBy,
      keepVersions, allowSchemaChange, commitTag = commitTag)
    if (tableExists(layer, table))
      spark.catalog.refreshTable(s"$layer.$table")
    if (partitionBy.isEmpty) maybeAutoCompact(layer, table)
  }

  /** Delta auto-compaction: opt-in via
    * `spark.conf.set("graft.autoCompact.minFiles", n)` — after a commit
    * leaves more than n data files in the live snapshot, a follow-up
    * OPTIMIZE packs them to `graft.autoCompact.targetFileSize` (default
    * 128 MiB) as its own version. The write stays fast (no pre-write
    * shuffle); the debt is repaid immediately and atomically, which is
    * exactly Delta's post-commit auto-compact shape. Small frequent
    * appends/micro-batches are the trigger case; the compaction cost is
    * O(fragmented data), bounded by the same file-count check that
    * triggers it. */
  private def maybeAutoCompact(layer: String, table: String): Unit =
    spark.conf.getOption("graft.autoCompact.minFiles")
      .map(_.trim.toInt).filter(_ > 0).foreach { minFiles =>
        val dir = new Path(path(layer, table))
        val f = fs
        if (f.exists(dir)) {
          val nFiles = f.listStatus(dir).count { st =>
            val n = st.getPath.getName
            st.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
          if (nFiles > minFiles)
            // best-effort, like Delta's: the caller's OWN commit already
            // landed, so losing the compaction race to a concurrent
            // writer must not fail the write — the fragmentation debt
            // simply re-triggers on the next commit
            try compact(layer, table,
              spark.conf.getOption("graft.autoCompact.targetFileSize")
                .map(_.trim.toLong).getOrElse(128L * 1024 * 1024))
            catch { case _: Catalog.ConcurrentCommitException => () }
        }
      }

  /** Versioned append — the `INSERT INTO` lowering
    * ([[Catalog.appendPath]]): existing files hard-linked into the next
    * snapshot, new rows' files added, committed through the ordinary swap.
    * O(new data + file-count metadata), never O(table). */
  def append(df: DataFrame, layer: String, table: String): Unit = {
    Catalog.appendPath(spark, df, path(layer, table), keepVersions)
    if (tableExists(layer, table))
      spark.catalog.refreshTable(s"$layer.$table")
    maybeAutoCompact(layer, table)
  }

  /** Register the table in the session catalog so `spark.table` /
    * `spark.sql` can address it by name (the reference's external-location
    * DDL, Silver_Customers.py:46-48). */
  def register(layer: String, table: String): Unit = {
    spark.sql(s"CREATE SCHEMA IF NOT EXISTS $layer")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $layer.$table
          USING parquet LOCATION '${path(layer, table)}'""")
  }

  def tableExists(layer: String, table: String): Boolean =
    spark.catalog.tableExists(s"$layer.$table")

  def dropRegistration(layer: String, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $layer.$table")

  /** Delta OPTIMIZE's job for this layout: rewrite the live snapshot into
    * ~`targetFileSize`-byte files as a NEW version through the ordinary
    * swap (contents unchanged, history gains an entry, the retired version
    * ages out through retention/vacuum). Small files accumulate from
    * frequent merges/micro-batches; scan cost at 100 TB is dominated by
    * file-open overhead once files shrink below ~100 MB, so periodic
    * compaction is part of the scale posture, not cosmetics.
    * Bucket-partitioned tables compact per bucket via
    * [[graft.merge.PartitionedMerge.compact]] — only oversized buckets are
    * rewritten. `partitionBy` (for directory-partitioned snapshots) packs
    * each partition into one file instead of size-targeted global packing. */
  def compact(layer: String, table: String, targetFileSize: Long,
      partitionBy: Seq[String] = Nil, zorderBy: Seq[String] = Nil): Unit = {
    Catalog.compactPath(spark, path(layer, table), targetFileSize,
      keepVersions, partitionBy, zorderBy)
    if (tableExists(layer, table))
      spark.catalog.refreshTable(s"$layer.$table")
  }

  /** Partition-scoped OPTIMIZE (Delta `OPTIMIZE t WHERE <pred>`):
    * [[compact]] restricted to the hive partitions a partition-column
    * predicate matches — untouched partitions hard-link into the new
    * version. See [[Catalog.compactWherePath]]. */
  def compactWhere(layer: String, table: String, predicate: String): Unit = {
    Catalog.compactWherePath(spark, path(layer, table), predicate,
      keepVersions)
    if (tableExists(layer, table))
      spark.catalog.refreshTable(s"$layer.$table")
  }

  /** Delta RESTORE's job: make version `v`'s contents the LIVE snapshot, as
    * a NEW version (the restored-from state stays in the log — Delta's
    * semantics exactly). Bucketed tables materialize the reconstruction as
    * a full bucket-partitioned snapshot. */
  def restore(layer: String, table: String, v: Int): Unit = {
    Catalog.restorePath(spark, path(layer, table), v, keepVersions)
    if (tableExists(layer, table))
      spark.catalog.refreshTable(s"$layer.$table")
  }

  /** Delta `DEEP CLONE`: an independent physical copy of the LIVE
    * snapshot — the clone starts its own history at version 1 and later
    * writes to either table never touch the other. The copy preserves the
    * source's physical layout byte for byte (bucket dirs, file packing,
    * z-ordering), which a read-and-rewrite clone would destroy. Local/HDFS
    * cost is a file copy; on an object store the same loop issues
    * server-side copies — either way O(live data), never O(history). */
  def clone(srcLayer: String, srcTable: String,
      dstLayer: String, dstTable: String): Unit = {
    Catalog.clonePath(spark, path(srcLayer, srcTable),
      path(dstLayer, dstTable))
    if (tableExists(srcLayer, srcTable)) register(dstLayer, dstTable)
  }

  /** Delta `SHALLOW CLONE`: a zero-copy clone sharing the source's live
    * data files. Delta implements it as metadata referencing the source's
    * paths; a plain-parquet directory has no metadata layer, so the local/
    * HDFS equivalent is a HARD-LINK tree — O(file count) metadata ops, no
    * data movement, and (better than Delta's) immune to a later VACUUM of
    * the source: unlinking a name never frees a still-linked inode. On
    * stores without links (S3) the same walk degrades to server-side
    * copies. Like DEEP CLONE the clone starts its own history. */
  def shallowClone(srcLayer: String, srcTable: String,
      dstLayer: String, dstTable: String): Unit = {
    Catalog.clonePath(spark, path(srcLayer, srcTable),
      path(dstLayer, dstTable), shallow = true)
    if (tableExists(srcLayer, srcTable)) register(dstLayer, dstTable)
  }

  /** Delta `ALTER TABLE … RENAME COLUMN` (column mapping's headline use).
    * Plain parquet has no name-mapping layer, so the rename REWRITES the
    * live snapshot under the new name as an ordinary versioned commit —
    * time travel still reads retired versions under the OLD name, exactly
    * the per-version schema Delta's mapping preserves. Columns referenced
    * by CHECK constraints or generated-column definitions refuse (Delta's
    * rule — drop the dependent object first). */
  def renameColumn(layer: String, table: String, oldName: String,
      newName: String): Unit = {
    Catalog.renameColumnPath(spark, path(layer, table), oldName, newName,
      keepVersions)
    reRegister(layer, table)
  }

  /** Delta `ALTER TABLE … DROP COLUMN`: versioned rewrite without the
    * column (retired versions still carry it — RESTORE brings it back).
    * Same dependency guards as [[renameColumn]]. */
  def dropColumn(layer: String, table: String, name: String): Unit = {
    Catalog.dropColumnPath(spark, path(layer, table), name, keepVersions)
    reRegister(layer, table)
  }

  /** A v1 external table pins its metastore schema at CREATE time; after a
    * column rename/drop the registration must be rebuilt so `spark.table`
    * sees the new shape (ALTER TABLE RENAME/DROP COLUMN is v2-only). */
  private def reRegister(layer: String, table: String): Unit =
    if (tableExists(layer, table)) {
      dropRegistration(layer, table)
      register(layer, table)
      spark.catalog.refreshTable(s"$layer.$table")
    }

  /** Delta `table_changes` for this layout ([[ChangeFeed.tableChanges]]):
    * net changes between two logged versions; with `keys`, full CDC rows
    * including update pre/post images. */
  def changes(layer: String, table: String, fromV: Int, toV: Int,
      keys: Seq[String] = Nil): org.apache.spark.sql.DataFrame =
    ChangeFeed.tableChanges(spark, path(layer, table), fromV, toV, keys)

  /** Delta `ALTER TABLE … ADD CONSTRAINT name CHECK (expr)`: existing rows
    * are validated first (one scan — Delta's semantics), then the
    * constraint is recorded and every later snapshot write through this
    * catalog enforces it ([[Catalog.overwritePath]]). */
  def addConstraint(layer: String, table: String, name: String,
      check: String): Unit =
    Catalog.addConstraintPath(spark, path(layer, table), name, check)

  def dropConstraint(layer: String, table: String, name: String): Unit =
    Catalog.dropConstraintPath(spark, path(layer, table), name)

  /** The table's recorded CHECK constraints, as (name, expression SQL). */
  def constraints(layer: String, table: String): Seq[(String, String)] =
    Catalog.readConstraintsPath(spark, path(layer, table))

  /** Delta `GENERATED ALWAYS AS` for this layout: record the column,
    * materialize it over the existing data as a new version, and have
    * every later snapshot write compute it when absent / validate it when
    * provided ([[Catalog.overwritePath]]). */
  def addGeneratedColumn(layer: String, table: String, name: String,
      expr: String): Unit = {
    Catalog.addGeneratedColumnPath(spark, path(layer, table), name, expr)
    if (tableExists(layer, table)) {
      // v1 external tables pin their metastore schema — same rule as
      // MERGE WITH SCHEMA EVOLUTION
      val dt = read(layer, table).schema(name).dataType.sql
      spark.sql(s"ALTER TABLE $layer.$table ADD COLUMNS (`$name` $dt)")
      spark.catalog.refreshTable(s"$layer.$table")
    }
  }

  def generatedColumns(layer: String, table: String): Seq[(String, String)] =
    Catalog.readGeneratedPath(spark, path(layer, table))

  /** Stop generating/validating the column; the DATA column stays (it is
    * real data in every snapshot) — it just becomes an ordinary column. */
  def dropGeneratedColumn(layer: String, table: String, name: String): Unit =
    Catalog.dropGeneratedColumnPath(spark, path(layer, table), name)

  /** Delta `GENERATED ALWAYS AS IDENTITY` for this layout: record the
    * column, materialize it over existing rows as a new version, and have
    * every later write assign `max(existing) + step·i` to rows of frames
    * that omit the column. ALWAYS semantics: `INSERT` statements may not
    * provide values; engine rewrites (compact/restore/merge), which carry
    * the existing column through, preserve it untouched. Uniqueness and
    * monotonicity are guaranteed; density is not (Delta's contract). */
  def addIdentityColumn(layer: String, table: String, name: String,
      start: Long = 1L, step: Long = 1L): Unit = {
    Catalog.addIdentityColumnPath(spark, path(layer, table), name, start,
      step)
    if (tableExists(layer, table)) {
      spark.sql(s"ALTER TABLE $layer.$table ADD COLUMNS (`$name` BIGINT)")
      spark.catalog.refreshTable(s"$layer.$table")
    }
  }

  def identityColumns(layer: String, table: String): Seq[(String, Long, Long)] =
    Catalog.readIdentityPath(spark, path(layer, table))

  /** Stop assigning; the column becomes ordinary data. */
  def dropIdentityColumn(layer: String, table: String, name: String): Unit =
    Catalog.dropIdentityColumnPath(spark, path(layer, table), name)

  /** Delta's stats collection (ANALYZE … FOR COLUMNS) for this layout:
    * per-file min/max/null stats (+ optional Bloom filters) into the
    * snapshot's `_skipping` manifest — [[graft.layout.DataSkipping]]. */
  def analyzeSkipping(layer: String, table: String, cols: Seq[String],
      bloomCols: Seq[String] = Nil): Int =
    graft.layout.DataSkipping.analyze(spark, path(layer, table), cols,
      bloomCols)

  /** Stats-pruned read — only files whose stats admit a match are scanned;
    * results are exactly the unpruned filter's. */
  def readSkipping(layer: String, table: String,
      preds: Seq[graft.layout.DataSkipping.SkipPred]): DataFrame =
    graft.layout.DataSkipping.read(spark, path(layer, table), preds)

  /** Delta VACUUM's job for this layout: delete abandoned staging dirs
    * (`.tmp`, `.tmp-merge` from a crashed swap), retired per-bucket
    * `.prev-*` dirs (PartitionedMerge's rotation leftovers), and version-log
    * entries that fell out of the retention window. Never touches the live
    * snapshot, the pointer, or retained versions. Returns deleted paths.
    * `dryRun` (Delta's `VACUUM … DRY RUN`) lists them without deleting. */
  def vacuum(layer: String, table: String, dryRun: Boolean = false)
      : Seq[String] =
    Catalog.vacuumPath(spark, path(layer, table), keepVersions, dryRun)

  /** Merge-on-read DML ([[graft.layout.DeletionVectors]]): with the mode
    * on, `deleteWhere`/`updateWhere` commit position sidecars instead of
    * rewriting the table — O(matched), never O(table). Reads through this
    * catalog always apply whatever sidecar exists. */
  def enableDeletionVectors(layer: String, table: String): Unit =
    graft.layout.DeletionVectors.enable(spark, path(layer, table))

  def disableDeletionVectors(layer: String, table: String): Unit =
    graft.layout.DeletionVectors.disable(spark, path(layer, table))

  /** Row-level DELETE; merge-on-read when the table's DV mode is on,
    * copy-on-write otherwise. Returns num_affected_rows. */
  def deleteWhere(layer: String, table: String,
      cond: org.apache.spark.sql.Column): Long = {
    val dir = path(layer, table)
    val n =
      if (graft.layout.DeletionVectors.isEnabled(spark, dir))
        graft.layout.DeletionVectors.deleteWhere(spark, dir, cond,
          keepVersions)
      else if (Catalog.isBucketedLayout(fs, dir))
        // copy-on-write scoped to the touched buckets — never O(table)
        graft.layout.BucketedDml.deleteWhereCow(spark, dir, cond,
          keepVersions)
      else if (Catalog.partitionColsOf(fs, dir).isEmpty)
        // flat snapshot: rewrite only the FILES holding matches, link
        // the rest — never O(table)
        graft.layout.FileGranularDml.deleteWhere(spark, dir, cond,
          keepVersions)
      else {
        val t = graft.layout.DeletionVectors.readPath(spark, dir)
        val c = org.apache.spark.sql.functions.coalesce(cond,
          org.apache.spark.sql.functions.lit(false))
        val matched = t.filter(c).count()
        // partition-dir trees keep the full rewrite, preserving their
        // layout (partitionBy read off the dir — the DmlSql parity)
        if (matched > 0)
          Catalog.overwritePath(spark, t.filter(!c), dir,
            Catalog.partitionColsOf(fs, dir), keepVersions,
            operation = "DELETE")
        matched
      }
    if (n > 0 && tableExists(layer, table))
      spark.catalog.refreshTable(s"$layer.$table")
    n
  }

  /** Row-level UPDATE; merge-on-read when the table's DV mode is on. */
  def updateWhere(layer: String, table: String,
      cond: org.apache.spark.sql.Column,
      assign: Seq[(String, org.apache.spark.sql.Column)]): Long = {
    val dir = path(layer, table)
    val n =
      if (graft.layout.DeletionVectors.isEnabled(spark, dir))
        graft.layout.DeletionVectors.updateWhere(spark, dir, cond, assign,
          keepVersions)
      else if (Catalog.isBucketedLayout(fs, dir))
        graft.layout.BucketedDml.updateWhereCow(spark, dir, cond, assign,
          keepVersions)
      else if (Catalog.partitionColsOf(fs, dir).isEmpty)
        graft.layout.FileGranularDml.updateWhere(spark, dir, cond, assign,
          keepVersions)
      else {
        val t = graft.layout.DeletionVectors.readPath(spark, dir)
        val c = org.apache.spark.sql.functions.coalesce(cond,
          org.apache.spark.sql.functions.lit(false))
        def assigned(x: String) = assign.collectFirst {
          case (an, v) if an.equalsIgnoreCase(x) => v }
        val projected = t.select(t.schema.fields.toSeq.map { fld =>
          assigned(fld.name) match {
            case Some(v) => org.apache.spark.sql.functions.when(c,
                v.cast(fld.dataType))
              .otherwise(org.apache.spark.sql.functions.col(fld.name))
              .as(fld.name)
            case None => org.apache.spark.sql.functions.col(fld.name)
          }
        }: _*)
        val matched = t.filter(c).count()
        // same partition-layout threading as deleteWhere
        if (matched > 0)
          Catalog.overwritePath(spark, projected, dir,
            Catalog.partitionColsOf(fs, dir), keepVersions,
            operation = "UPDATE")
        matched
      }
    if (n > 0 && tableExists(layer, table))
      spark.catalog.refreshTable(s"$layer.$table")
    n
  }

  /** Fold the table's deletion-vector sidecar into rewritten files
    * (Delta `REORG … APPLY (PURGE)`). */
  def materializeDeletes(layer: String, table: String): Unit = {
    graft.layout.DeletionVectors.materialize(spark, path(layer, table),
      keepVersions)
    if (tableExists(layer, table))
      spark.catalog.refreshTable(s"$layer.$table")
  }
}

object Catalog {
  import org.apache.hadoop.fs.FileSystem

  // The snapshot-swap / crash-recovery PRIMITIVES (version-log layout,
  // pointer commit, recovery epoch) live in [[graft.layout.SwapProtocol]]
  // as their own reviewable unit (VERDICT r9 #8); these forwarders keep
  // the historical Catalog.* call sites stable.
  import graft.layout.SwapProtocol
  private[graft] def historyDir(dir: String) = SwapProtocol.historyDir(dir)
  private[graft] def versionDir(dir: String, v: Int) =
    SwapProtocol.versionDir(dir, v)
  private[catalog] def readSmallFile(f: FileSystem, p: Path): String =
    SwapProtocol.readSmallFile(f, p)
  private[graft] def readPointer(f: FileSystem, dir: String): Int =
    SwapProtocol.readPointer(f, dir)
  private[graft] def writePointer(f: FileSystem, dir: String, v: Int): Unit =
    SwapProtocol.writePointer(f, dir, v)
  private[graft] def readRecoveryEpoch(f: FileSystem, dir: String): String =
    SwapProtocol.readRecoveryEpoch(f, dir)
  private[graft] def bumpRecoveryEpoch(f: FileSystem, dir: String): Unit =
    SwapProtocol.bumpRecoveryEpoch(f, dir)

  /** The latest commit-tag value for `key` across the live snapshot and
    * the logged versions (newest first). A commit tag is a tiny
    * `_graft_commit_tag_<key>` file written INTO the staged snapshot
    * before the swap rename — so it becomes visible atomically WITH the
    * commit it describes. A streaming sink stamps its (checkpoint, batchId)
    * here; on replay after a crash between the swap and its own
    * checkpoint-side marker, the table itself answers "was this batch
    * already committed?" — closing the swap-to-marker duplicate window.
    * Tags are per-version (appends do not link `_`-prefixed files
    * forward), hence the newest-first history probe. */
  /** Tag key every commit stamps with the operation that produced the
    * version (Delta's `operation` column in `DESCRIBE HISTORY`). */
  private[catalog] val OperationTagKey = "operation"

  def lastCommitTag(spark: SparkSession, dir: String,
      key: String): Option[String] = {
    val root = new Path(dir)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(root)) return None
    def tagOf(d: Path): Option[String] = {
      val p = new Path(d, s"_graft_commit_tag_$key")
      if (f.exists(p)) Some(readSmallFile(f, p)) else None
    }
    tagOf(root).orElse {
      val hist = historyDir(dir)
      if (!f.exists(hist)) None
      else f.listStatus(hist).map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.drop(1).nonEmpty &&
          n.drop(1).forall(_.isDigit))
        .map(_.drop(1).toInt).sorted(Ordering.Int.reverse).toSeq
        .iterator.flatMap(v => tagOf(versionDir(dir, v))).nextOption()
    }
  }

  /** Every commit tag visible on the LIVE snapshot (key → value, key
    * order) — the material the SQL `SHOW TBLPROPERTIES` surface lists:
    * operator-stamped bounds (`ivf.maxList`), materialized-view refresh
    * watermarks, streaming batch markers, and the `operation` stamp.
    * Tags carry forward across commits (the [[commitSwap]] rule), so
    * the live dir alone answers — one bounded `listStatus`, no history
    * walk. */
  def listCommitTags(spark: SparkSession, dir: String)
      : Seq[(String, String)] = {
    val root = new Path(dir)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(root)) Nil
    else f.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("_graft_commit_tag_"))
      .map(p => p.getName.stripPrefix("_graft_commit_tag_") ->
        readSmallFile(f, p))
      .sortBy(_._1).toSeq
  }

  /** Per-version (version, is_current, commit time, entry count, bytes,
    * operation) rows for a table directory — the computation behind both
    * [[Catalog!.history]] and the SQL `DESCRIBE HISTORY` command. The
    * operation is the committing writer's self-report (WRITE / APPEND /
    * MERGE / DELETE / UPDATE / OPTIMIZE / RESTORE / …); versions written
    * before operation stamping, and bucketed-table log entries (created
    * at retire time, outside the swap), report WRITE. */
  def historyRows(spark: SparkSession, dir: String)
      : Seq[(Int, Boolean, java.sql.Timestamp, Int, Long, String)] = {
    val root = new Path(dir)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = readPointer(f, dir)
    if (cur == 0) return Nil
    val hist = historyDir(dir)
    val logged =
      if (!f.exists(hist)) Nil
      else f.listStatus(hist).map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.drop(1).nonEmpty &&
          n.drop(1).forall(_.isDigit))
        .map(_.drop(1).toInt).filter(_ < cur).sorted.toSeq
    (logged :+ cur).map { v =>
      val p = if (v == cur) root else versionDir(dir, v)
      val entries = f.listStatus(p)
        .filterNot(s => s.getPath.getName.startsWith("_"))
      val opFile = new Path(p, s"_graft_commit_tag_$OperationTagKey")
      val op =
        if (f.exists(opFile)) readSmallFile(f, opFile) else "WRITE"
      (v, v == cur,
        new java.sql.Timestamp(f.getFileStatus(p).getModificationTime),
        entries.length, entries.map(_.getLen).sum, op)
    }
  }

  /** Resolve a version number to its snapshot directory (live dir for the
    * current version, log entry otherwise) — the seam SQL `VERSION AS OF`
    * resolution shares with [[Catalog.readVersion]]. */
  def resolveVersionPath(spark: SparkSession, dir: String, v: Int): String = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = readPointer(f, dir)
    require(v >= 1 && v <= cur,
      s"version $v out of range for $dir (current = $cur)")
    if (v == cur) dir
    else {
      val p = versionDir(dir, v)
      require(f.exists(p), s"version $v of $dir was pruned from the log")
      p.toString
    }
  }

  /** Resolve a commit timestamp to a version number: the NEWEST version
    * whose commit time is ≤ `millis` (Delta's `TIMESTAMP AS OF` rule). A
    * timestamp at or past the latest commit reads the live snapshot; one
    * before the earliest RETAINED commit raises (that state is no longer
    * reconstructible — same contract as a pruned `VERSION AS OF`). Commit
    * times are the per-version times `historyRows` reports: a snapshot
    * directory's files are written once and the directory is only ever
    * renamed afterwards, so its modification time is the write time of
    * that version — the swap never rewrites retired data. Bucketed tables
    * can't use directory times (their log entries are created at RETIRE
    * time — the NEXT version's commit) so every bucket-swap commit stamps
    * an explicit `_commit_time_v{N}` marker instead, and resolution reads
    * those ([[graft.merge.PartitionedMerge.commitTimes]]). */
  def resolveTimestampVersion(spark: SparkSession, dir: String, millis: Long)
      : Int = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (isBucketedLayout(f, dir)) {
      val cur = readPointer(f, dir)
      val stamped = graft.merge.PartitionedMerge.commitTimes(spark, dir)
        .filter(_._1 <= cur)
      require(stamped.nonEmpty,
        s"no commit-time records for bucketed table $dir (written before " +
          "timestamp support); use VERSION AS OF <n>")
      // only versions whose every transition [v, cur) is still retained
      // are reconstructible — same contract as a pruned VERSION AS OF
      val minReconstructible = (1 to cur).find(v =>
        (v until cur).forall(w => f.exists(versionDir(dir, w)))).getOrElse(cur)
      val eligible = stamped
        .filter { case (v, t) => v >= minReconstructible && t <= millis }
      require(eligible.nonEmpty,
        s"timestamp ${new java.sql.Timestamp(millis)} is before the " +
          s"earliest retained version of $dir (earliest stamped commit: " +
          new java.sql.Timestamp(stamped.map(_._2).min) + ")")
      return eligible.map(_._1).max
    }
    val rows = historyRows(spark, dir)
    require(rows.nonEmpty, s"table $dir does not exist")
    val eligible = rows.filter(_._3.getTime <= millis)
    require(eligible.nonEmpty,
      s"timestamp ${new java.sql.Timestamp(millis)} is before the earliest " +
        "retained version of " + dir + " (earliest commit: " +
        new java.sql.Timestamp(rows.map(_._3.getTime).min) + ")")
    eligible.map(_._1).max
  }

  def resolveTimestampPath(spark: SparkSession, dir: String, millis: Long)
      : String =
    resolveVersionPath(spark, dir, resolveTimestampVersion(spark, dir, millis))

  /** Partition column names of a partition-dir snapshot, read off the
    * layout itself (the first-child chain of `name=value` levels) — the
    * seam callers without catalog metadata (layer.table API, raw-path
    * tools) share with DmlSql's metastore-resolved `partCols`. Nil for
    * flat snapshots; `Seq(gbucket)` for the bucketed layout. */
  private[graft] def partitionColsOf(f: FileSystem, dir: String)
      : Seq[String] = {
    val cols = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = new Path(dir)
    var descend = f.exists(p)
    while (descend) {
      val sub = f.listStatus(p).filter { s =>
        val n = s.getPath.getName
        s.isDirectory && n.contains("=") &&
          !n.startsWith("_") && !n.startsWith(".")
      }
      if (sub.isEmpty) descend = false
      else { cols += sub.head.getPath.getName.takeWhile(_ != '=')
             p = sub.head.getPath }
    }
    cols.toSeq
  }

  /** Does `dir` hold PartitionedMerge's bucket layout? One listing, plus
    * the `<dir>.buckets` manifest as the durable marker: a fully-emptied
    * bucketed table has NO live bucket dirs (every one retired), and
    * losing the layout identity there would let a flat append corrupt
    * the tree or an empty-state read fail schema inference. */
  private[graft] def isBucketedLayout(
      f: FileSystem, dir: String): Boolean = {
    val p = new Path(dir)
    f.exists(p) && (
      f.listStatus(p).exists(_.getPath.getName
        .startsWith(graft.merge.PartitionedMerge.BucketCol + "=")) ||
      f.exists(new Path(dir + ".buckets")))
  }

  /** Version-addressed relation — the seam SQL time travel reads through.
    * Plain snapshots read the resolved snapshot dir; bucket-partitioned
    * tables reconstruct the version from the per-bucket retire log (bucket
    * column retained, matching the registered live relation's shape). */
  def versionRead(spark: SparkSession, dir: String, v: Int): DataFrame =
    versionRead(spark, dir, v, None)

  /** As [[versionRead]], with a caller-known schema forwarded to the
    * snapshot read — skips the per-call footer-inference job when a
    * caller resolves many versions of one table (the q250 epoch
    * audit's shape). Bucketed reconstruction ignores the hint. */
  def versionRead(spark: SparkSession, dir: String, v: Int,
      schemaHint: Option[org.apache.spark.sql.types.StructType])
      : DataFrame = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (isBucketedLayout(f, dir))
      graft.merge.PartitionedMerge.reconstructVersion(spark, dir, v)
    else graft.layout.DeletionVectors.readPath(spark,
      resolveVersionPath(spark, dir, v), schemaHint)
  }

  /** [[Catalog!.compact]] on a raw table directory — the seam SQL
    * `OPTIMIZE <table>` shares with the layer.table API. */
  /** Partition-scoped OPTIMIZE (Delta `OPTIMIZE t WHERE <pred>`): pack
    * ONLY the hive partitions matching a partition-column predicate into
    * one file each (the partitioned [[compactPath]] convention); every
    * other partition's files hard-link into the new version unchanged.
    * At 100 TB this is the difference between compacting yesterday's
    * ingest partition and rewriting the table: cost is O(matched data +
    * file-count metadata). Per Delta's rule the predicate may reference
    * partition columns only — it resolves by partition pruning on the
    * scan, so matching never reads data rows; the matched-directory set
    * comes from the pruned scan's own file list (no hand re-derivation
    * of partition-value escaping). */
  def compactWherePath(spark: SparkSession, dir: String, predicate: String,
      keepVersions: Int = 10): Unit = raceToConflict(dir) {
    val dst = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val f = dst.getFileSystem(conf)
    require(f.exists(dst), s"no table at $dir")
    require(!isBucketedLayout(f, dir),
      "bucketed layouts compact per bucket — OPTIMIZE already rewrites " +
        "only oversized buckets; WHERE has nothing to add")
    require(!graft.layout.DeletionVectors.hasDv(spark, dir),
      s"$dir carries a deletion-vector sidecar; run full OPTIMIZE " +
        "(which folds it) before partition-scoped compaction")
    val partCols = partitionColsOf(f, dir)
    require(partCols.nonEmpty,
      "OPTIMIZE ... WHERE requires a hive-partitioned snapshot")
    val pred = org.apache.spark.sql.functions.expr(predicate)
    // parse once more for the reference check (Spark 4's Column no
    // longer exposes its expression): collect the referenced NAMES
    val refs = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.name.toLowerCase
      }.toSet
    require(refs.nonEmpty &&
      refs.subsetOf(partCols.map(_.toLowerCase).toSet),
      s"OPTIMIZE WHERE predicate may reference partition columns only " +
        s"(${partCols.mkString(", ")}), got: $predicate")
    val stagedAgainst = readPointer(f, dir)
    val all = spark.read.parquet(dir)
    // which partition DIRS matched: ask the pruned scan for its files
    val basePath = f.makeQualified(dst).toUri.getPath
    val matchedRel = all.filter(pred)
      .select(org.apache.spark.sql.functions.input_file_name().as("p"))
      .distinct().collect()
      .map { r =>
        val p = new Path(new java.net.URI(r.getString(0))).toUri.getPath
        val rel = p.stripPrefix(basePath).stripPrefix("/")
        rel.substring(0, rel.lastIndexOf('/')) // the partition dir
      }.toSet
    if (matchedRel.nonEmpty) { // no match → no-op, no empty version
      val tmp = stagingPath(dir, "")
      f.mkdirs(tmp)
      linkDataTree(f, conf, dst, tmp)
      // unlink the matched partitions — their packed rewrite replaces them
      matchedRel.foreach(rel => f.delete(new Path(tmp, rel), true))
      val stage = stagingPath(dir, "-optwhere")
      all.filter(pred)
        .repartition(partCols.map(org.apache.spark.sql.functions.col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy(partCols: _*).parquet(stage.toString)
      mergeStagedTree(f, stage, tmp)
      f.delete(stage, true)
      // linked files keep valid skipping stats; rewritten files are
      // unprofiled until the next analyze (appendPath's rule)
      val skipDir = new Path(dst, "_skipping")
      if (f.exists(skipDir))
        org.apache.hadoop.fs.FileUtil.copy(f, skipDir,
          f, new Path(tmp, "_skipping"), false, false, conf)
      commitSwap(spark, f, dir, tmp, keepVersions, Some(stagedAgainst),
        None, "OPTIMIZE WHERE")
    }
  }

  /** Partition-scoped OVERWRITE (Delta `replaceWhere` restricted to
    * partition values, its safe core): atomically replace the listed
    * `partCol=value` partitions with `df`'s rows. Every other
    * partition's files hard-link into the new version unchanged, so the
    * cost is O(replaced data + file-count metadata) — at 100 TB this is
    * the difference between refreshing yesterday's partitions and
    * rewriting the table. Semantics, all enforced:
    *
    *   - `df` may only carry rows for the listed values (Delta's
    *     replaceWhere constraint) — anything else would silently widen
    *     the replacement;
    *   - a listed partition absent from `df` is DROPPED (replace means
    *     replace); one not yet on the table is created;
    *   - the swap is a single versioned commit (time travel, CDF,
    *     RESTORE all see one transition), OCC-checked against the
    *     version the staging linked. */
  def replacePartitionValuesPath(spark: SparkSession, df: DataFrame,
      dir: String, partCol: String, values: Seq[String],
      keepVersions: Int = 10,
      commitTag: Option[(String, String)] = None): Unit =
      raceToConflict(dir) {
    import org.apache.spark.sql.functions.{col, input_file_name}
    // if/else, not an early return — non-local returns throw through
    // the raceToConflict closure (DeletionVectors' rule)
    if (values.isEmpty) ()
    else {
    val dst = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val f = dst.getFileSystem(conf)
    require(f.exists(dst), s"no table at $dir")
    require(!isBucketedLayout(f, dir),
      "bucketed layouts replace per bucket through merge/DML, not " +
        "partition values")
    require(!graft.layout.DeletionVectors.hasDv(spark, dir),
      s"$dir carries a deletion-vector sidecar; OPTIMIZE (which folds " +
        "it) before partition-scoped replacement")
    val partCols = partitionColsOf(f, dir)
    require(partCols.map(_.toLowerCase).contains(partCol.toLowerCase),
      s"'$partCol' is not a partition column of $dir " +
        s"(${partCols.mkString(", ")})")
    require(df.columns.exists(_.equalsIgnoreCase(partCol)),
      s"replacement frame must carry the partition column '$partCol'")
    // Delta's replaceWhere gate: the frame may not smuggle rows into
    // partitions outside the declared set. NULL partition values must
    // fail the gate too — `!isInCollection` is NULL for them, so a
    // bare negation would silently pass rows bound for the
    // __HIVE_DEFAULT_PARTITION__ dir (Delta's replaceWhere rejects
    // them; so do we)
    val stray = df.filter(col(partCol).isNull ||
      !col(partCol).isInCollection(values)).isEmpty
    require(stray, s"replacement frame carries rows outside the " +
      s"listed $partCol values — widen `values` or filter the frame")
    val stagedAgainst = readPointer(f, dir)
    val all = spark.read.parquet(dir)
    // which partition DIRS the listed values currently own: the pruned
    // scan's own file list (no hand re-derivation of value escaping) —
    // same technique as compactWherePath
    val basePath = f.makeQualified(dst).toUri.getPath
    val matchedRel = all.filter(col(partCol).isInCollection(values))
      .select(input_file_name().as("p"))
      .distinct().collect()
      .map { r =>
        val p = new Path(new java.net.URI(r.getString(0))).toUri.getPath
        val rel = p.stripPrefix(basePath).stripPrefix("/")
        rel.substring(0, rel.lastIndexOf('/'))
      }.toSet
    val tmp = stagingPath(dir, "")
    f.mkdirs(tmp)
    linkDataTree(f, conf, dst, tmp)
    matchedRel.foreach(rel => f.delete(new Path(tmp, rel), true))
    if (!df.isEmpty) {
      val stage = stagingPath(dir, "-replace")
      df.repartition(partCols.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy(partCols: _*).parquet(stage.toString)
      mergeStagedTree(f, stage, tmp)
      f.delete(stage, true)
    }
    // linked files keep valid skipping stats; replaced partitions are
    // unprofiled until the next analyze (appendPath's rule)
    val skipDir = new Path(dst, "_skipping")
    if (f.exists(skipDir))
      org.apache.hadoop.fs.FileUtil.copy(f, skipDir,
        f, new Path(tmp, "_skipping"), false, false, conf)
    commitSwap(spark, f, dir, tmp, keepVersions, Some(stagedAgainst),
      commitTag, "REPLACE WHERE")
    }
  }

  def compactPath(spark: SparkSession, dir: String, targetFileSize: Long,
      keepVersions: Int = 10, partitionBy: Seq[String] = Nil,
      zorderBy: Seq[String] = Nil): Unit = raceToConflict(dir) {
    require(targetFileSize > 0, "targetFileSize must be positive")
    require(partitionBy.isEmpty || zorderBy.isEmpty,
      "ZORDER clusters across files; combine it with bucketed layouts, " +
        "not hive partitioning")
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (isBucketedLayout(f, dir)) {
      // ZORDER composes with bucketing by clustering WITHIN each bucket:
      // bucket pruning keeps governing key lookups, the z-curve tightens
      // per-file ranges for filters on the clustered columns
      if (zorderBy.nonEmpty)
        graft.merge.PartitionedMerge.zorderCompact(spark, dir, zorderBy,
          targetFileSize, keepVersions)
      else
        graft.merge.PartitionedMerge.compact(spark, dir, targetFileSize,
          keepVersions)
      ()
    } else {
      val it = f.listFiles(new Path(dir), true)
      var bytes = 0L; var nFiles = 0
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        val parent = st.getPath.getParent.getName
        if (!name.startsWith("_") && !name.startsWith(".") &&
            !parent.startsWith("_") && !parent.startsWith(".")) {
          bytes += st.getLen; nFiles += 1
        }
      }
      val n = math.max(1L, (bytes + targetFileSize - 1) / targetFileSize).toInt
      // ZORDER always rewrites (re-clustering has value at any file count,
      // Delta's semantics); plain compaction skips when already packed —
      // unless a deletion-vector sidecar is pending, which OPTIMIZE always
      // materializes away
      if (zorderBy.isEmpty && nFiles <= n &&
          !graft.layout.DeletionVectors.hasDv(spark, dir)) return
      // remember the skipping-stats recipe: the rewrite invalidates every
      // per-file entry (stale stats are SAFE — unmatched names just stop
      // pruning — but an OPTIMIZE that silently turns skipping off would
      // betray the reason Z-ordering exists)
      val statsRecipe = graft.layout.DataSkipping.analyzedColumns(spark, dir)
      // DV-applied: OPTIMIZE folds any deletion-vector sidecar into the
      // rewritten files (Delta's PURGE) — the staged snapshot drops `_dv`
      val df = graft.layout.DeletionVectors.readPath(spark, dir)
      val packed =
        if (zorderBy.nonEmpty)
          graft.layout.ZOrder.cluster(df, zorderBy, n)
        else if (partitionBy.nonEmpty)
          df.repartition(partitionBy.map(col): _*)
        else df.repartition(n)
      overwritePath(spark, packed, dir, partitionBy, keepVersions,
        operation =
          if (zorderBy.nonEmpty) "OPTIMIZE ZORDER BY" else "OPTIMIZE",
        carryTags = true) // content-identical: stream markers survive
      statsRecipe.foreach { case (cols, bloomCols, bits, hashes) =>
        graft.layout.DataSkipping.analyze(spark, dir, cols, bloomCols,
          bits, hashes)
      }
    }
  }

  /** [[Catalog!.restore]] on a raw table directory — the seam SQL
    * `RESTORE TABLE ... VERSION AS OF n` shares with the layer.table API.
    * A bucketed reconstruction is rewritten as a FULL bucket-partitioned
    * snapshot; the whole pre-restore live dir retires as one log entry, so
    * earlier versions keep reconstructing (a full entry covers every
    * bucket an older read could need). */
  def restorePath(spark: SparkSession, dir: String, v: Int,
      keepVersions: Int = 10): Unit = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // restoring to a version that predates a schema change is the point
    // of RESTORE — the old shape wins
    if (isBucketedLayout(f, dir))
      overwritePath(spark,
        graft.merge.PartitionedMerge.reconstructVersion(spark, dir, v),
        dir, Seq(graft.merge.PartitionedMerge.BucketCol), keepVersions,
        allowSchemaChange = true, operation = "RESTORE")
    else
      overwritePath(spark, versionRead(spark, dir, v), dir, Nil, keepVersions,
        allowSchemaChange = true, operation = "RESTORE")
  }

  /** Table versions a LIVE pipeline-epoch manifest references — vacuum
    * retains these past `keepVersions`, or `PipelineEpoch.readAt`
    * would fail inside the epoch retention window (the default
    * `keepEpochs` = 20 exceeds the default `keepVersions` = 10, so on
    * a busy table the windows WILL cross). Discovery is by the
    * catalog's fixed path shape — `<warehouse>/<layer>/<table>` with
    * epochs at `<warehouse>/_pipeline_epochs/<pipeline>/epoch_v*` — so
    * every vacuum entry point (instance API, raw path, SQL `VACUUM`)
    * honors the pin without new plumbing; a dir outside a warehouse
    * simply finds no epochs root. Cost: one bounded listing per
    * pipeline (`keepEpochs` caps each) plus one small read per
    * manifest — metadata scale. Racing epoch commits/prunes are fine:
    * a manifest vanishing mid-read is skipped (it was pruned → its
    * pins are released). */
  /** Per-warehouse manifest cache for [[epochProtectedVersions]]:
    * manifests are IMMUTABLE once published (put-if-absent link), so a
    * pipeline's parsed pins stay valid while its manifest LISTING is
    * unchanged — one listing confirms that, versus re-reading every
    * retained manifest on every commit (a per-micro-batch table would
    * otherwise pay ~keepEpochs small reads per commit; on an object
    * store those are GETs). Keyed by pipeline dir; value = (manifest
    * (name, mtime, length) fingerprints, table → pinned versions).
    * The fingerprint includes mtime+length — not just names — because a
    * warehouse deleted and recreated at the same path REPEATS manifest
    * names (`epoch_v1`…) with different contents (ADVICE r13). Bounded:
    * LRU-evicted past [[epochPinCacheCap]] pipelines, so a long-lived
    * session touching many warehouses (a multi-tenant driver, every
    * test run) cannot accumulate entries forever; a miss just re-parses
    * a bounded manifest set. */
  private[graft] var epochPinCacheCap = 64 // var: spec shrinks it to pin eviction
  private val epochPinCache =
    new java.util.LinkedHashMap[
        String, (Seq[(String, Long, Long)], Map[String, Set[Int]])](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[
            String, (Seq[(String, Long, Long)], Map[String, Set[Int]])])
          : Boolean = size() > epochPinCacheCap
    }

  private[graft] def epochPinCacheSize: Int =
    epochPinCache.synchronized(epochPinCache.size())

  /** TEST SEAM: the cache is process-wide and `removeEldestEntry` evicts
    * at most one entry per put, so a spec shrinking the cap must start
    * from empty for the bound to be assertable regardless of which
    * suites ran first. */
  private[graft] def epochPinCacheClear(): Unit =
    epochPinCache.synchronized(epochPinCache.clear())

  /** One retained manifest's text for the PIN sweep. Failure semantics
    * matter here (ADVICE r13 medium): a manifest VANISHING means it was
    * pruned — its pins are released, read as empty. A manifest that
    * still EXISTS but cannot be read is a storage fault; treating it as
    * empty would fail OPEN (prune epoch-pinned versions and permanently
    * break `PipelineEpoch.readAt` inside the retention window), so
    * after bounded retries the sweep fails LOUDLY — the vacuum/commit
    * that triggered it can rerun, the pinned snapshot cannot come back. */
  private def readPinManifest(f: FileSystem, p: Path): String = {
    var attempt = 0
    while (true) {
      try return graft.layout.SwapProtocol.readSmallFile(f, p)
      catch {
        case e: java.io.IOException =>
          if (!f.exists(p)) return "" // pruned mid-sweep → pins released
          attempt += 1
          if (attempt >= 3) throw new IllegalStateException(
            s"pipeline-epoch manifest $p exists but could not be read " +
              "after 3 attempts — refusing to prune with unknown pins", e)
          Thread.sleep(5L * attempt)
      }
    }
    "" // unreachable
  }

  private[graft] def epochProtectedVersions(spark: SparkSession,
      dir: String): Set[Int] = {
    val p = new Path(dir)
    val layerDir = p.getParent
    if (layerDir == null || layerDir.getParent == null) return Set.empty
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochsRoot = new Path(layerDir.getParent, "_pipeline_epochs")
    if (!f.exists(epochsRoot)) return Set.empty
    val name = s"${layerDir.getName}.${p.getName}"
    (for {
      pipe <- f.listStatus(epochsRoot).toSeq if pipe.isDirectory
    } yield {
      val stats = f.listStatus(pipe.getPath).toSeq
        .filter(_.getPath.getName.startsWith("epoch_v"))
        .sortBy(_.getPath.getName)
      val token = stats.map(s =>
        (s.getPath.getName, s.getModificationTime, s.getLen))
      // fold the pipeline's warehouse-instance id into the KEY: a
      // warehouse deleted and recreated at the same path republishes
      // epoch_v1.. with different contents, and (name, mtime, length)
      // can collide across the recreation within the store's mtime
      // granularity (1 s on object stores) — the fresh instance UUID
      // (put-if-absent at first commit) makes the recreated pipeline a
      // different cache key, so a stale entry can never be served. The
      // id read is one small file per pipeline per sweep and shares
      // readPinManifest's fail-LOUD semantics (missing = legacy
      // pre-instance dir, read as ""; exists-but-unreadable = throw).
      val instP = new Path(pipe.getPath,
        graft.pipeline.PipelineEpoch.InstanceFile)
      val instanceId =
        if (f.exists(instP)) readPinManifest(f, instP) else ""
      val key = s"${pipe.getPath}@$instanceId"
      val cached = epochPinCache.synchronized {
        Option(epochPinCache.get(key))
      }.filter(_._1 == token).map(_._2)
      val byTable = cached.getOrElse {
        val parsed = (for {
          st <- stats
          line <- readPinManifest(f, st.getPath).split('\n').toSeq
          parts = line.split('\t')
          if parts.length == 2
          v <- parts(1).toIntOption
        } yield parts(0) -> v)
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        // reached only when every retained manifest read cleanly
        // (readPinManifest throws otherwise) — a failed parse is never
        // cached under a still-matching fingerprint
        epochPinCache.synchronized {
          epochPinCache.put(key, (token, parsed))
        }
        parsed
      }
      byTable.getOrElse(name, Set.empty[Int])
    }).foldLeft(Set.empty[Int])(_ ++ _)
  }

  /** Is version-log entry `e` of `dir` protected by an epoch pin?
    * Flat snapshots are self-contained — exact membership. Bucketed
    * reconstruction of version v walks EVERY retire entry v..cur
    * (`versionBucketDirs` requires the range complete), so there a pin
    * on v protects all entries ≥ v. */
  private[graft] def epochPinProtects(spark: SparkSession, f: FileSystem,
      dir: String, e: Int): Boolean = {
    val pinned = epochProtectedVersions(spark, dir)
    if (pinned.isEmpty) false
    else if (isBucketedLayout(f, dir)) pinned.min <= e
    else pinned.contains(e)
  }

  /** [[Catalog!.vacuum]] on a raw table directory — the seam SQL
    * `VACUUM <table>` shares with the layer.table API. Versions
    * referenced by a live pipeline-epoch manifest are retained past
    * `keepVersions` ([[epochProtectedVersions]]) — the two retention
    * policies never contradict each other. */
  def vacuumPath(spark: SparkSession, dir: String, keepVersions: Int = 10,
      dryRun: Boolean = false): Seq[String] = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    def rm(p: Path): Unit =
      if (f.exists(p)) {
        if (!dryRun) f.delete(p, true)
        deleted += p.toString
      }
    // staging leftovers: every data-staging sibling carries a `.tmp`
    // name prefix — fixed legacy names (.tmp, .tmp-merge, .tmp-insert,
    // .tmp-replace) and the unique per-attempt `.tmp-<uuid>` dirs a
    // crashed or race-losing writer abandons
    val parent = new Path(dir).getParent
    val base = new Path(dir).getName
    if (parent != null && f.exists(parent))
      f.listStatus(parent).map(_.getPath)
        .filter(_.getName.startsWith(base + ".tmp")).foreach(rm)
    rm(new Path(dir + ".constraints.tmp"))
    rm(new Path(dir + ".generated.tmp"))
    rm(new Path(dir + ".identity.tmp"))
    rm(new Path(dir + ".buckets.tmp"))
    val tableDir = new Path(dir)
    if (f.exists(tableDir))
      f.listStatus(tableDir).map(_.getPath)
        .filter(_.getName.startsWith(".prev-")).foreach(rm)
    val cur = readPointer(f, dir)
    val hist = historyDir(dir)
    if (f.exists(hist)) {
      // hoisted: one manifest scan for the whole sweep, not one per entry
      val pinned = epochProtectedVersions(spark, dir)
      // bucketed reconstruction needs every entry ≥ the pinned version,
      // so there the pin is a floor; flat snapshots pin exact entries
      val pinFloor =
        if (pinned.nonEmpty && isBucketedLayout(f, dir)) pinned.min
        else Int.MaxValue
      f.listStatus(hist).map(_.getPath)
        .filter { p =>
          val n = p.getName
          n.startsWith("v") && n.drop(1).nonEmpty &&
            n.drop(1).forall(_.isDigit) &&
            n.drop(1).toInt <= cur - 1 - keepVersions && {
              val e = n.drop(1).toInt
              e < pinFloor && !pinned.contains(e)
            }
        }.foreach(rm)
      // pointer-write tmp files abandoned by a crashed commit
      f.listStatus(hist).map(_.getPath)
        .filter(_.getName.startsWith("_current.tmp")).foreach(rm)
      // a version log supersedes the legacy single-depth `.prev` dir —
      // reclaim it (kept while no log exists: it is still the only
      // previous-snapshot copy for old-layout warehouses)
      rm(new Path(dir + ".prev"))
    }
    deleted.toSeq
  }

  /** The swap protocol on a raw table directory (shared by the layer.table
    * API above and SQL surfaces that resolve a table to its location, e.g.
    * `graft.sql.MergeIntoSql`): write to `<dir>.tmp`, retire current into
    * the version log `<dir>.history/v{N}`, rename tmp → current, THEN
    * advance the `_current` pointer — so a crash at any step leaves the
    * pointer naming a version whose data is intact (the old one). Aborts on
    * a failed retire rename — Hadoop rename INTO a still-existing directory
    * nests the new snapshot inside the old one, silently corrupting the
    * table — and never overwrites an existing log entry. Log entries older
    * than `keepVersions` behind the new head are pruned. */
  /** [[Catalog!.clone]] on raw directories — the seam the SQL statement
    * shares. Refuses to overwrite an existing destination. */
  def clonePath(spark: SparkSession, srcDir: String, dstDir: String,
      version: Option[Int] = None, shallow: Boolean = false): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(srcDir).getFileSystem(conf)
    val kind = if (shallow) "SHALLOW CLONE" else "DEEP CLONE"
    // `VERSION AS OF` clone of a BUCKETED table: a historical version is
    // not one directory but a per-bucket selection across the live dir
    // and retire entries — link/copy exactly those bucket dirs (each with
    // its own `_dv` sidecar, so the clone carries that version's deletion
    // state). O(table file count) metadata for a shallow clone, like the
    // live-dir case.
    if (version.nonEmpty && isBucketedLayout(fs, srcDir)) {
      val dp = new Path(dstDir)
      require(!fs.exists(dp), s"$kind destination exists: $dstDir")
      val entries = graft.merge.PartitionedMerge.versionBucketDirs(
        spark, srcDir, version.get)
      fs.mkdirs(dp)
      entries.foreach { case (name, _, p) =>
        val d = new Path(dp, name)
        if (shallow) linkTree(fs, conf, p, d)
        else require(org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, d,
          false, false, conf), s"clone copy failed: $p -> $d")
      }
      // the clone is a first-class bucketed table: record its schema
      // sidecar (the reconstruction's shape) so file-less states read
      graft.merge.PartitionedMerge.writeSchemaSidecar(spark, dstDir,
        graft.merge.PartitionedMerge.readRaw(spark, dstDir).schema)
      return
    }
    // `VERSION AS OF` clone: copy the logged snapshot's files instead of
    // the live dir (plain snapshot layouts)
    val resolvedSrc = version match {
      case None => srcDir
      case Some(v) => resolveVersionPath(spark, srcDir, v)
    }
    val sp = new Path(resolvedSrc); val dp = new Path(dstDir)
    require(fs.exists(sp), s"$kind source missing: $resolvedSrc")
    require(!fs.exists(dp), s"$kind destination exists: $dstDir")
    if (shallow) linkTree(fs, conf, sp, dp)
    else require(org.apache.hadoop.fs.FileUtil.copy(fs, sp, fs, dp,
      false, false, conf), s"clone copy failed: $resolvedSrc -> $dstDir")
    // the clone's history starts fresh: no pointer, no log entries
    val hist = historyDir(dstDir)
    if (fs.exists(hist)) fs.delete(hist, true)
  }

  /** SHALLOW CLONE's physical step: mirror the directory tree, hard-linking
    * every file on link-capable filesystems (local: one inode, two names —
    * O(metadata), and the clone survives any later delete of the source
    * NAME because the inode lives while any link does). Filesystems
    * without links fall back to a copy, keeping the statement's semantics
    * (independent tables) at deep-clone cost. */
  private def linkTree(f: FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      src: Path, dst: Path): Unit = {
    val canLink = f.getScheme == "file"
    f.mkdirs(dst)
    f.listStatus(src).foreach { st =>
      val d = new Path(dst, st.getPath.getName)
      if (st.isDirectory) linkTree(f, conf, st.getPath, d)
      else if (canLink)
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(f.makeQualified(d).toUri.getPath),
          java.nio.file.Paths.get(f.makeQualified(st.getPath).toUri.getPath))
      else require(org.apache.hadoop.fs.FileUtil.copy(f, st.getPath, f, d,
        false, false, conf), s"clone copy failed: ${st.getPath} -> $d")
    }
  }

  // ------------------------------------------------- column DDL

  /** Column names referenced by the table's CHECK constraints and
    * generated-column definitions (parsed from the expression text, not
    * regex-matched — a literal mentioning the name doesn't count), plus the
    * generated column names themselves. Gate for rename/drop. */
  private def dependentColumnUses(spark: SparkSession, dir: String)
      : Seq[(String, String)] = {
    def refs(kind: String, entries: Seq[(String, String)]) =
      entries.flatMap { case (n, e) =>
        spark.sessionState.sqlParser.parseExpression(e).collect {
          case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            (ua.nameParts.last.toLowerCase, s"$kind $n")
        }
      }
    refs("constraint", readConstraintsPath(spark, dir)) ++
      refs("generated column", readGeneratedPath(spark, dir)) ++
      readGeneratedPath(spark, dir).map { case (n, _) =>
        (n.toLowerCase, s"generated column $n (is generated)") } ++
      readIdentityPath(spark, dir).map { case (n, _, _) =>
        (n.toLowerCase, s"identity column $n (is identity)") }
  }

  private def requireUnreferenced(spark: SparkSession, dir: String,
      col: String, op: String): Unit = {
    val uses = dependentColumnUses(spark, dir)
      .filter(_._1 == col.toLowerCase).map(_._2).distinct
    require(uses.isEmpty,
      s"$op $col on $dir refused: referenced by ${uses.mkString(", ")} — " +
        "drop the dependent constraint/generated column first")
  }

  /** [[Catalog!.renameColumn]] on a raw table directory — the seam the SQL
    * statement shares. The rewrite is one distributed pass committed
    * through the ordinary snapshot swap; skipping stats are re-derived
    * under the new name so OPTIMIZE/ANALYZE investments survive the
    * rename. */
  def renameColumnPath(spark: SparkSession, dir: String, oldName: String,
      newName: String, keepVersions: Int = 10): Unit = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(new Path(dir)), s"table $dir does not exist")
    require(newName.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"column name must be an identifier, got '$newName'")
    val bucketed = isBucketedLayout(f, dir)
    require(!oldName.equalsIgnoreCase(graft.merge.PartitionedMerge.BucketCol),
      "the bucket column is the table's physical layout; it cannot be renamed")
    val cur = graft.layout.DeletionVectors.readPath(spark, dir)
    val real = cur.columns.find(_.equalsIgnoreCase(oldName)).getOrElse(
      throw new IllegalArgumentException(s"no column $oldName in $dir " +
        s"(have: ${cur.columns.mkString(", ")})"))
    require(!cur.columns.exists(_.equalsIgnoreCase(newName)),
      s"column $newName already exists in $dir")
    requireUnreferenced(spark, dir, oldName, "RENAME COLUMN")
    // the `_skipping` manifest retires with the old snapshot dir — capture
    // the recipe BEFORE the swap (compactPath's pattern) and re-derive the
    // stats under the new name, so ANALYZE investments survive the rename
    val statsRecipe = graft.layout.DataSkipping.analyzedColumns(spark, dir)
    overwritePath(spark, cur.withColumnRenamed(real, newName), dir,
      if (bucketed) Seq(graft.merge.PartitionedMerge.BucketCol) else Nil,
      keepVersions, allowSchemaChange = true, operation = "RENAME COLUMN")
    statsRecipe.foreach { case (cols, blooms, bits, hashes) =>
      def m(c: String) = if (c.equalsIgnoreCase(real)) newName else c
      graft.layout.DataSkipping.analyze(spark, dir, cols.map(m),
        blooms.map(m), bits, hashes)
    }
  }

  /** [[Catalog!.dropColumn]] on a raw table directory. Accepts several
    * columns so a multi-column `DROP COLUMNS (a, b)` is ONE distributed
    * rewrite, not one per column. */
  def dropColumnPath(spark: SparkSession, dir: String, name: String,
      keepVersions: Int = 10): Unit =
    dropColumnsPath(spark, dir, Seq(name), keepVersions)

  def dropColumnsPath(spark: SparkSession, dir: String, names: Seq[String],
      keepVersions: Int = 10): Unit = {
    require(names.nonEmpty, "no columns to drop")
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(new Path(dir)), s"table $dir does not exist")
    val bucketed = isBucketedLayout(f, dir)
    names.foreach(n => require(
      !n.equalsIgnoreCase(graft.merge.PartitionedMerge.BucketCol),
      "the bucket column is the table's physical layout; it cannot be dropped"))
    val cur = graft.layout.DeletionVectors.readPath(spark, dir)
    val real = names.map(n =>
      cur.columns.find(_.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(s"no column $n in $dir " +
          s"(have: ${cur.columns.mkString(", ")})")))
    val dataCols = cur.columns.filterNot(_.equalsIgnoreCase(
      graft.merge.PartitionedMerge.BucketCol))
    require(dataCols.length > real.distinct.length,
      s"cannot drop ${real.mkString(", ")}: no data columns would remain " +
        s"in $dir")
    names.foreach(n => requireUnreferenced(spark, dir, n, "DROP COLUMN"))
    val statsRecipe = graft.layout.DataSkipping.analyzedColumns(spark, dir)
    overwritePath(spark, cur.drop(real: _*), dir,
      if (bucketed) Seq(graft.merge.PartitionedMerge.BucketCol) else Nil,
      keepVersions, allowSchemaChange = true, operation = "DROP COLUMNS")
    // re-derive skipping stats minus the dropped columns; a recipe that
    // covered only dropped columns simply lapses (manifest retired with
    // the old snapshot — pruned reads degrade to full filters)
    val dropped = real.map(_.toLowerCase).toSet
    statsRecipe.foreach { case (cols, blooms, bits, hashes) =>
      val keep = cols.filterNot(c => dropped(c.toLowerCase))
      if (keep.nonEmpty)
        graft.layout.DataSkipping.analyze(spark, dir, keep,
          blooms.filterNot(c => dropped(c.toLowerCase)), bits, hashes)
    }
  }

  // ------------------------------------------------- CHECK constraints

  /** Table-level CHECK constraints (Delta `ALTER TABLE … ADD CONSTRAINT`,
    * the DQ layer the reference gets from Delta next to DLT expectations —
    * [[graft.quality.Expectations]] gates ROWS, constraints gate WRITES).
    * Stored as a sibling `<dir>.constraints` manifest (name TAB expr per
    * line, tmp+rename commit) so they are a property of the TABLE and
    * survive snapshot swaps. SQL-standard violation semantics: a row
    * violates only when the expression evaluates to FALSE — NULL passes
    * (use `x IS NOT NULL` for nullability). */
  private def constraintsFile(dir: String) = new Path(dir + ".constraints")

  def readConstraintsPath(spark: SparkSession, dir: String)
      : Seq[(String, String)] = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = constraintsFile(dir)
    if (!f.exists(p)) return Nil
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val i = l.indexOf('\t'); (l.substring(0, i), l.substring(i + 1))
      }.toList
    finally in.close()
  }

  private def writeConstraints(spark: SparkSession, dir: String,
      entries: Seq[(String, String)]): Unit = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = constraintsFile(dir)
    if (entries.isEmpty) { if (f.exists(dst)) f.delete(dst, false); return }
    val tmp = new Path(dir + ".constraints.tmp")
    val out = f.create(tmp, true)
    try out.write(entries.map { case (n, e) => s"$n\t$e" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (f.exists(dst)) f.delete(dst, false)
    require(f.rename(tmp, dst), s"constraints commit failed: $dst")
  }

  /** Per-constraint violation counts over `df` in ONE aggregation pass
    * (`sum(expr IS FALSE)` per constraint — no per-constraint scans). */
  private def violations(df: DataFrame,
      cons: Seq[(String, String)]): Seq[(String, Long)] = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, sum, when}
    val aggs = cons.map { case (n, e) =>
      sum(when(coalesce(expr(e), lit(true)) === false, 1L).otherwise(0L))
        .as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cons.indices.map(i => (cons(i)._1,
      if (row.isNullAt(i)) 0L else row.getLong(i))) // empty df → null sums
  }

  private[graft] def enforce(df: DataFrame, cons: Seq[(String, String)],
      dir: String): Unit = {
    val bad = violations(df, cons).filter(_._2 > 0)
    if (bad.nonEmpty) throw new IllegalStateException(
      s"CHECK constraint violation writing $dir: " + bad.map {
        case (n, c) => s"$n ($c rows)"
      }.mkString(", "))
  }

  // ------------------------------------------------- generated columns

  /** `GENERATED ALWAYS AS` metadata: sibling `<dir>.generated` manifest,
    * same commit protocol as constraints. */
  private def generatedFile(dir: String) = new Path(dir + ".generated")

  def readGeneratedPath(spark: SparkSession, dir: String)
      : Seq[(String, String)] = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = generatedFile(dir)
    if (!f.exists(p)) return Nil
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val i = l.indexOf('\t'); (l.substring(0, i), l.substring(i + 1))
      }.toList
    finally in.close()
  }

  def addGeneratedColumnPath(spark: SparkSession, dir: String, name: String,
      expr: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"generated column name must be an identifier, got '$name'")
    val existing = readGeneratedPath(spark, dir)
    require(!existing.exists(_._1.equalsIgnoreCase(name)),
      s"generated column $name already exists on $dir")
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = f.exists(new Path(dir))
    if (hasData) {
      val cur = graft.layout.DeletionVectors.readPath(spark, dir)
      require(!cur.columns.exists(_.equalsIgnoreCase(name)),
        s"column $name already exists in $dir's data")
      // materialize over existing rows as a NEW version, so readers and
      // time travel see a consistent table from this point on
      overwritePath(spark,
        cur.withColumn(name, org.apache.spark.sql.functions.expr(expr)), dir,
        allowSchemaChange = true, operation = "ADD COLUMN")
    }
    val tmp = new Path(dir + ".generated.tmp")
    val out = f.create(tmp, true)
    try out.write((existing :+ (name -> expr))
      .map { case (n, e) => s"$n\t$e" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val dst = generatedFile(dir)
    if (f.exists(dst)) f.delete(dst, false)
    require(f.rename(tmp, dst), s"generated-columns commit failed: $dst")
  }

  def dropGeneratedColumnPath(spark: SparkSession, dir: String,
      name: String): Unit = {
    val existing = readGeneratedPath(spark, dir)
    require(existing.exists(_._1.equalsIgnoreCase(name)),
      s"no generated column $name on $dir")
    val remaining = existing.filterNot(_._1.equalsIgnoreCase(name))
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = generatedFile(dir)
    if (remaining.isEmpty) { if (f.exists(dst)) f.delete(dst, false); return }
    val tmp = new Path(dir + ".generated.tmp")
    val out = f.create(tmp, true)
    try out.write(remaining.map { case (n, e) => s"$n\t$e" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (f.exists(dst)) f.delete(dst, false)
    require(f.rename(tmp, dst), s"generated-columns commit failed: $dst")
  }

  // ------------------------------------------------- identity columns

  /** `GENERATED ALWAYS AS IDENTITY` metadata: sibling `<dir>.identity`
    * manifest (name TAB start TAB step), same commit protocol. The high
    * watermark is NOT cached here — it derives from a column-pruned
    * max() over the live data at assignment time, so a crash can never
    * strand a stale counter that would hand out duplicate ids (Delta
    * caches it in the txn log, whose atomicity we don't have for a
    * sibling file). The scan reads ONE column; the documented upgrade
    * path at extreme commit rates is a watermark in the version log. */
  private def identityFile(dir: String) = new Path(dir + ".identity")

  def readIdentityPath(spark: SparkSession, dir: String)
      : Seq[(String, Long, Long)] = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = identityFile(dir)
    if (!f.exists(p)) return Nil
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val parts = l.split('\t')
        (parts(0), parts(1).toLong, parts(2).toLong)
      }.toList
    finally in.close()
  }

  private def writeIdentity(spark: SparkSession, dir: String,
      entries: Seq[(String, Long, Long)]): Unit = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = identityFile(dir)
    if (entries.isEmpty) { if (f.exists(dst)) f.delete(dst, false); return }
    val tmp = new Path(dir + ".identity.tmp")
    val out = f.create(tmp, true)
    try out.write(entries.map { case (n, s, k) => s"$n\t$s\t$k" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (f.exists(dst)) f.delete(dst, false)
    require(f.rename(tmp, dst), s"identity commit failed: $dst")
  }

  def addIdentityColumnPath(spark: SparkSession, dir: String, name: String,
      start: Long = 1L, step: Long = 1L): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"identity column name must be an identifier, got '$name'")
    require(step >= 1, s"IDENTITY INCREMENT BY must be >= 1, got $step")
    val existing = readIdentityPath(spark, dir)
    require(!existing.exists(_._1.equalsIgnoreCase(name)),
      s"identity column $name already exists on $dir")
    require(!readGeneratedPath(spark, dir)
        .exists(_._1.equalsIgnoreCase(name)),
      s"$name is already a generated column on $dir")
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(new Path(dir))) {
      val cur = graft.layout.DeletionVectors.readPath(spark, dir)
      require(!cur.columns.exists(_.equalsIgnoreCase(name)),
        s"column $name already exists in $dir's data")
      // materialize over existing rows as a new version
      overwritePath(spark,
        fillIdentity(cur, name, start - step, step), dir,
        allowSchemaChange = true, operation = "ADD COLUMN")
    }
    writeIdentity(spark, dir, existing :+ ((name, start, step)))
  }

  def dropIdentityColumnPath(spark: SparkSession, dir: String,
      name: String): Unit = {
    val existing = readIdentityPath(spark, dir)
    require(existing.exists(_._1.equalsIgnoreCase(name)),
      s"no identity column $name on $dir")
    writeIdentity(spark, dir,
      existing.filterNot(_._1.equalsIgnoreCase(name)))
  }

  /** Append `base + step·(i+1)` ids: per-partition sequences with
    * partition-size offsets (zipWithIndex — two narrow passes, no
    * single-partition window), the SurrogateKeys.assign shape without the
    * sort: identity promises uniqueness + monotonicity vs the watermark,
    * not any row order. */
  private def fillIdentity(df: DataFrame, name: String, base: Long,
      step: Long): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val withIdx = df.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (base + step * (i + 1)))
    }
    df.sparkSession.createDataFrame(withIdx,
      StructType(df.schema.fields :+ StructField(name, LongType, false)))
  }

  /** Fill every recorded-but-absent identity column, continuing above the
    * live data's watermark (column-pruned max scan; `start - step` when
    * the table is new/empty so the first id is exactly `start`). */
  private[graft] def fillIdentityColumns(spark: SparkSession, df: DataFrame,
      dir: String, f: FileSystem): DataFrame =
    readIdentityPath(spark, dir).foldLeft(df) { case (d, (n, start, step)) =>
      if (d.columns.exists(_.equalsIgnoreCase(n))) d
      else {
        val base =
          if (!f.exists(new Path(dir))) start - step
          else {
            val row = spark.read.parquet(dir).select(n).agg(
              org.apache.spark.sql.functions.max(
                org.apache.spark.sql.functions.col(n))).collect()(0)
            if (row.isNullAt(0)) start - step else row.getLong(0)
          }
        fillIdentity(d, n, math.max(base, start - step), step)
      }
    }

  def addConstraintPath(spark: SparkSession, dir: String, name: String,
      check: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"constraint name must be an identifier, got '$name'")
    val existing = readConstraintsPath(spark, dir)
    require(!existing.exists(_._1.equalsIgnoreCase(name)),
      s"constraint $name already exists on $dir")
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Delta's rule: existing data must already satisfy the new constraint
    // (LIVE rows — a DV-deleted violation is already gone)
    if (f.exists(new Path(dir)))
      enforce(graft.layout.DeletionVectors.readPath(spark, dir),
        Seq(name -> check), dir)
    writeConstraints(spark, dir, existing :+ (name -> check))
  }

  def dropConstraintPath(spark: SparkSession, dir: String,
      name: String): Unit = {
    val existing = readConstraintsPath(spark, dir)
    require(existing.exists(_._1.equalsIgnoreCase(name)),
      s"no constraint $name on $dir")
    writeConstraints(spark, dir,
      existing.filterNot(_._1.equalsIgnoreCase(name)))
  }

  /** Raised when an optimistic commit loses the race: the table moved past
    * the version the writer staged against (Delta's
    * ConcurrentModificationException family). The staged work is
    * discarded; re-read and retry. */
  final class ConcurrentCommitException private (msg: String, unused: Null)
      extends IllegalStateException(msg) {
    def this(dir: String, expected: Int, actual: Int) = this(
      s"concurrent commit on $dir: staged against version $expected but " +
        s"the table is now at $actual — re-read and retry", null)
    def this(dir: String) = this(
      s"concurrent commit on $dir: the live snapshot's files were retired " +
        "by another commit during staging — re-read and retry", null)
  }

  /** Bounded optimistic retry for commit bodies that are a pure function
    * of the CURRENT table state — Delta's logical conflict resolution,
    * expressed as a combinator. A blind append, a merge that re-reads
    * its target, a DV delete recomputing matched positions: each attempt
    * re-reads the live snapshot during staging, so losing the pointer
    * race and re-running IS a correct rebase onto the winner's commit
    * (the loser's semantics apply to whatever state the winner left).
    * Bodies that cache a pre-read snapshot across attempts — or encode a
    * decision taken against the old version — must NOT use this: they
    * would silently overwrite the interleaved commit, the exact hazard
    * the optimistic check exists to surface.
    *
    * Without this, N jobs appending to one table (per-hour metric
    * writers, a fan-in of shard summaries — the everyday multi-writer
    * shape on a large cluster) all fail but one; with it they serialize
    * like Delta's non-conflicting ConcurrentAppend retries. Backoff is
    * exponential with full jitter, capped at ~1.6 s per wait, so N
    * racers don't re-collide in lockstep; exhaustion rethrows the final
    * typed conflict with the attempt count in the message chain. */
  def commitWithRetry[A](dir: String, maxAttempts: Int = 8)(body: => A): A = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1: $maxAttempts")
    var attempt = 0
    while (true) {
      attempt += 1
      try return body catch {
        case e: ConcurrentCommitException =>
          if (attempt >= maxAttempts)
            throw new IllegalStateException(
              s"commit on $dir still conflicting after $attempt attempts", e)
          val capMs = math.min(1 << math.min(attempt + 3, 14), 1600)
          Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
            .nextLong(capMs.toLong) + 1)
      }
    }
    throw new IllegalStateException("unreachable") // satisfies the type
  }

  /** Wrap a commit attempt whose STAGING reads the live snapshot
    * (overwrite's schema check, append's file linking, restore's and
    * compact's reconstruction): a concurrent commit renames those files
    * into the version log mid-job, which Spark surfaces as
    * FAILED_READ_FILE / FileNotFound. That is a lost race, not
    * corruption — the other writer's commit is intact — so it re-raises
    * as the typed conflict callers already retry on. */
  /** [[DeletionVectors]]' entry to the same staged-read race handling. */
  private[graft] def raceToConflictShim[A](dir: String)(body: => A): A =
    raceToConflict(dir)(body)

  private def raceToConflict[A](dir: String)(body: => A): A =
    try body catch {
      case e: ConcurrentCommitException => throw e
      case e: Throwable if vanishedFile(e, 0) =>
        throw new ConcurrentCommitException(dir)
    }

  private def vanishedFile(e: Throwable, depth: Int): Boolean =
    e != null && depth < 12 && (
      e.isInstanceOf[java.io.FileNotFoundException] ||
      e.isInstanceOf[java.nio.file.NoSuchFileException] ||
      String.valueOf(e.getMessage).contains("FAILED_READ_FILE") ||
      vanishedFile(e.getCause, depth + 1))

  /** Unique per-attempt staging dir. Concurrent writers must never share
    * a staging path — with a fixed name the loser of a commit race deletes
    * or renames the winner's half-written files before the optimistic
    * check even runs. `.tmp`-prefixed siblings of the table dir are
    * vacuum's to reclaim (prefix sweep in [[vacuumPath]]). */
  private def stagingPath(dir: String, kind: String): Path =
    new Path(dir + ".tmp" + kind + "-" +
      java.util.UUID.randomUUID().toString.take(8))

  private[graft] def stagingPathShim(dir: String, kind: String): Path =
    stagingPath(dir, kind)

  /** Hard-link (copy on link-less stores) every data file of `src` into
    * `tmp` under its own name — the link-append staging step shared by
    * [[appendPath]] and [[graft.layout.DeletionVectors]]. */
  private[graft] def linkDataFiles(f: FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      src: Path, tmp: Path): Unit = {
    val canLink = f.getScheme == "file"
    f.listStatus(src).foreach { st =>
      val n = st.getPath.getName
      // files only: partition-dir levels are [[linkDataTree]]'s job
      if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) {
        val d = new Path(tmp, n)
        if (canLink)
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(f.makeQualified(d).toUri.getPath),
            java.nio.file.Paths.get(
              f.makeQualified(st.getPath).toUri.getPath))
        else require(org.apache.hadoop.fs.FileUtil.copy(f, st.getPath,
          f, d, false, false, conf), s"append link/copy failed: $n")
      }
    }
  }

  /** [[linkDataFiles]] extended through partition-dir levels: data files
    * link under their original relative paths, so a hive-partitioned
    * tree stages at O(file count) metadata like a flat snapshot.
    * Underscore/dot entries (version logs, sidecars) are skipped at
    * every level. Identical to [[linkDataFiles]] on a flat dir. */
  private[graft] def linkDataTree(f: FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      src: Path, tmp: Path): Unit = {
    linkDataFiles(f, conf, src, tmp) // the files at this level
    f.listStatus(src).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && !n.startsWith("_") && !n.startsWith(".")) {
        val d = new Path(tmp, n)
        f.mkdirs(d)
        linkDataTree(f, conf, st.getPath, d)
      }
    }
  }

  /** Move every staged data file of `stage` into `tmp` under its
    * relative path (partition dirs created as needed), collision-checked
    * so a staged name can never overwrite a linked one. */
  private[graft] def mergeStagedTree(f: FileSystem, stage: Path,
      tmp: Path): Unit = {
    f.listStatus(stage).foreach { st =>
      val n = st.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        val d = new Path(tmp, n)
        if (st.isDirectory) {
          f.mkdirs(d)
          mergeStagedTree(f, st.getPath, d)
        } else {
          require(!f.exists(d), s"append staging name collision: $n")
          require(f.rename(st.getPath, d), s"append stage move failed: $n")
        }
      }
    }
  }

  def overwritePath(spark: SparkSession, df: DataFrame, dir: String,
      partitionBy: Seq[String] = Nil, keepVersions: Int = 10,
      allowSchemaChange: Boolean = false,
      expectedVersion: Option[Int] = None,
      commitTag: Option[(String, String)] = None,
      operation: String = "WRITE",
      carryTags: Boolean = true): Unit = raceToConflict(dir) {
    val dst = new Path(dir)
    val tmp = stagingPath(dir, "")
    val f = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // GENERATED ALWAYS AS: compute absent generated columns into the
    // written frame; columns the writer DID provide are validated against
    // their expression below (Delta's consistency rule) — a generated
    // column can never silently diverge from its definition.
    val gens = readGeneratedPath(spark, dir)
    val provided = gens.filter { case (n, _) =>
      df.columns.exists(_.equalsIgnoreCase(n)) }
    val dfGen = fillIdentityColumns(spark,
      gens.foldLeft(df) { case (d, (n, e)) =>
        if (d.columns.exists(_.equalsIgnoreCase(n))) d
        else d.withColumn(n, org.apache.spark.sql.functions.expr(e))
      }, dir, f)
    // Delta's schema-on-write: an overwrite must match the live snapshot's
    // columns and types (order-insensitive, case-insensitive, nullability
    // ignored) unless the caller explicitly evolves — a typo'd column or
    // upstream type drift fails HERE, not in a downstream reader weeks
    // later. Driver-side schema compare (after generated-column fill); no
    // data cost.
    if (!allowSchemaChange && f.exists(dst)) {
      def shape(s: org.apache.spark.sql.types.StructType) =
        s.fields.map(x => x.name.toLowerCase -> x.dataType).toMap
      // flat snapshots record their schema in an in-dir sidecar at every
      // overwrite (below) — the check reads THAT (one small file) instead
      // of re-inferring from footers (a listing + a one-task Spark job
      // per commit, VERDICT r7 #1). Hive-partitioned trees keep the
      // inference path: partition-column types there come from directory
      // names, which the writer-side schema can't be trusted to mirror.
      val curSchema = (if (partitionBy.isEmpty)
          graft.merge.PartitionedMerge.schemaOf(spark, dir) else None)
        .getOrElse(spark.read.parquet(dir).schema)
      val (cur, nw) = (shape(curSchema), shape(dfGen.schema))
      if (cur != nw) {
        val added = (nw.keySet -- cur.keySet).toSeq.sorted
        val removed = (cur.keySet -- nw.keySet).toSeq.sorted
        val retyped = cur.keySet.intersect(nw.keySet)
          .filter(k => cur(k) != nw(k)).toSeq.sorted
          .map(k => s"$k: ${cur(k).simpleString} -> ${nw(k).simpleString}")
        throw new IllegalStateException(
          s"schema change writing $dir (pass allowSchemaChange to evolve): " +
            (Seq("added" -> added, "removed" -> removed,
              "retyped" -> retyped).collect {
              case (t, xs) if xs.nonEmpty => s"$t [${xs.mkString(", ")}]"
            }).mkString("; "))
      }
    }
    val w = dfGen.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)
    // stage the schema sidecar for flat snapshots — it becomes visible
    // atomically with the swap and serves the NEXT commit's schema check
    // driver-side. Underscore-prefixed, so scans ignore it and appends
    // don't link it forward (appendPath re-stamps its own).
    if (partitionBy.isEmpty)
      graft.merge.PartitionedMerge.writeSchemaSidecar(spark, tmp.toString,
        dfGen.schema)
    // CHECK enforcement: validate the STAGED files (no upstream recompute)
    // and abort before the swap — the live snapshot is never replaced by
    // violating data, and a failed write leaves no trace but the tmp dir
    // vacuum reclaims. Provided generated columns join the same one-pass
    // check as null-safe equality with their definition.
    val cons = readConstraintsPath(spark, dir) ++
      provided.map { case (n, e) => (s"__generated_$n", s"`$n` <=> ($e)") }
    if (cons.nonEmpty) {
      try enforce(spark.read.parquet(tmp.toString), cons, dir)
      catch { case e: Throwable => f.delete(tmp, true); throw e }
    }
    commitSwap(spark, f, dir, tmp, keepVersions, expectedVersion, commitTag,
      operation, carryTags)
  }

  /** The swap tail shared by overwrite and append: retire current into the
    * version log, rename the staged dir live, advance the pointer, prune
    * the one entry that aged out. Crash at any step leaves the pointer
    * naming a version whose data is intact (the old one).
    *
    * Optimistic concurrency (`expectedVersion`): a read-modify-write
    * caller records the version it staged against; if the pointer moved,
    * the staged dir is discarded and [[ConcurrentCommitException]] raised —
    * committing would silently drop the interleaved writer's rows. Two
    * racers that BOTH pass the check still cannot double-commit: they
    * share the same retire target `v{cur}`, and the second rename into an
    * existing log entry aborts (rename is the put-if-absent primitive
    * here, the same role Delta's transaction-log put plays). */
  private[graft] def commitSwap(spark: SparkSession, f: FileSystem, dir: String,
      tmp: Path, keepVersions: Int,
      expectedVersion: Option[Int] = None,
      commitTag: Option[(String, String)] = None,
      operation: String = "WRITE",
      carryTags: Boolean = true): Unit = {
    val dst = new Path(dir)
    // Caller tags carry forward BY DEFAULT (Delta likewise persists txn
    // app versions across every commit): a streaming sink's exactly-once
    // batch marker must survive whatever lands after it — an OPTIMIZE, a
    // row-level delete, a plain append — or a commit inside the
    // append→marker-record crash window reopens it and a replay
    // double-appends. Tag keys are per-checkpoint, so carried keys can
    // never collide with a different stream's; a commit's OWN tag key
    // still wins, and the operation tag is always re-stamped below.
    if (carryTags && f.exists(dst)) f.listStatus(dst).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("_graft_commit_tag_") &&
          n != s"_graft_commit_tag_$OperationTagKey" &&
          commitTag.forall(t => n != s"_graft_commit_tag_${t._1}"))
        org.apache.hadoop.fs.FileUtil.copy(f, st.getPath,
          f, new Path(tmp, n), false, false,
          spark.sparkContext.hadoopConfiguration)
    }
    // stamp the tags into the STAGED dir — they become visible atomically
    // with the swap rename below, never before, never after. Every commit
    // records the operation that produced it (Delta's operation column in
    // DESCRIBE HISTORY); callers add their own tags (e.g. a streaming
    // sink's batch marker) on top.
    (commitTag.toSeq :+ (OperationTagKey, operation)).foreach { case (k, v) =>
      val out = f.create(new Path(tmp, s"_graft_commit_tag_$k"), true)
      try out.write(v.getBytes("UTF-8")) finally out.close()
    }
    val cur = readPointer(f, dir)
    expectedVersion.filter(_ != cur).foreach { exp =>
      f.delete(tmp, true)
      throw new ConcurrentCommitException(dir, exp, cur)
    }
    if (f.exists(dst)) {
      f.mkdirs(historyDir(dir))
      val retired = versionDir(dir, cur)
      if (f.exists(retired) || !f.rename(dst, retired)) {
        // the retire rename is the put-if-absent that serializes racers:
        // losing it means another commit owns v{cur} — clean up our
        // staging and surface it as the concurrency conflict it is
        f.delete(tmp, true)
        throw new ConcurrentCommitException(dir, cur, readPointer(f, dir))
      }
    }
    if (!f.rename(tmp, dst)) {
      // dst reappeared: another writer won the dst-absent window (the
      // first-load race, or a racer slipping between our retire and
      // rename) — their commit is intact, ours loses cleanly
      f.delete(tmp, true)
      throw new ConcurrentCommitException(dir, cur, readPointer(f, dir))
    }
    // Hadoop rename(src, dst) with dst an EXISTING directory moves src
    // INSIDE it and still returns true — a racer that lost the dst-absent
    // window would silently nest its snapshot into the winner's live dir
    // and double-commit. Unique staging names make the nesting detectable:
    // our own tmp basename under dst means the other writer owns dst.
    val nested = new Path(dst, tmp.getName)
    if (f.exists(nested)) {
      f.delete(nested, true)
      throw new ConcurrentCommitException(dir, cur, readPointer(f, dir))
    }
    writePointer(f, dir, cur + 1)
    // bucketed layouts date every version with an explicit marker
    // (TIMESTAMP AS OF cannot use their retire-dir mtimes); a bucketed
    // table committed through THIS protocol (RESTORE, column DDL,
    // overwriteSnapshot) must stamp too, or those versions become
    // invisible to timestamp resolution
    if (isBucketedLayout(f, dir))
      graft.merge.PartitionedMerge.stampCommitTime(spark, dir, cur + 1)
    // Prune the ONE entry that just fell out of the retention window —
    // every earlier commit pruned its own, so probing all version numbers
    // from 1 would add FS round-trips that grow with table age (a
    // per-micro-batch table reaches tens of thousands of commits). Entries
    // orphaned by a lowered keepVersions — or left behind by an epoch pin
    // that has since been released — are vacuum's job.
    if (cur - keepVersions >= 1 &&
        !epochPinProtects(spark, f, dir, cur - keepVersions)) {
      val old = versionDir(dir, cur - keepVersions)
      if (f.exists(old)) f.delete(old, true)
      f.delete(graft.merge.PartitionedMerge.commitTimeMarker(
        dir, cur - keepVersions), false)
    }
    // Cached relations (file lists) outlive the swap; without a refresh,
    // readers keep resolving the retired snapshot's deleted files.
    spark.catalog.refreshByPath(dst.toString)
  }

  /** Versioned APPEND (the lowering for `INSERT INTO` over a graft table —
    * Spark's own v1 insert drops files into the directory in place,
    * bypassing the version log, CHECK constraints, and generated columns;
    * this path closes that hole). The next snapshot is staged as the
    * CURRENT files hard-linked (O(file count) metadata, zero data copy;
    * link-less stores degrade to copies) plus the new rows' files, then
    * committed through the ordinary swap — so an append is a real version
    * (time travel, RESTORE, CDF all see it) and costs O(new data), not
    * O(table). Constraints are enforced on the STAGED NEW files only:
    * existing data already passed at its own write time. Appends cannot
    * change the schema. Bucket-partitioned layouts route through
    * [[graft.layout.BucketedDml.insertInto]] (hash-routed per-bucket
    * commit); hive-partitioned snapshots still refuse (mixing flat
    * append files into a partition tree would corrupt discovery). */
  def appendPath(spark: SparkSession, df: DataFrame, dir: String,
      keepVersions: Int = 10,
      commitTag: Option[(String, String)] = None,
      operation: String = "APPEND"): Unit = raceToConflict(dir) {
    val dst = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val f = dst.getFileSystem(conf)
    if (!f.exists(dst)) { // first insert = first load, one uniform path
      overwritePath(spark, df, dir, Nil, keepVersions,
        commitTag = commitTag, operation = operation)
      return
    }
    // appends are read-modify-write (the staged snapshot LINKS the live
    // files read here) — record the version staged against, so a commit
    // after an interleaved writer raises instead of dropping their rows
    val stagedAgainst = readPointer(f, dir)
    if (isBucketedLayout(f, dir)) {
      // route new rows to their pmod(hash(keys), n) buckets through the
      // bucket-swap commit — only destination buckets change. The
      // exactly-once batch marker has no home in per-bucket history, so
      // streaming sinks must keep targeting snapshot tables. (if/else,
      // not an early return, for the non-local-return reasons
      // DeletionVectors documents.)
      require(commitTag.isEmpty,
        s"INSERT INTO bucketed table $dir cannot carry a commit tag " +
          "(per-bucket history has no tag store); stream into a snapshot " +
          "table instead")
      graft.layout.BucketedDml.insertInto(spark, df, dir, keepVersions)
    } else {
    // hive-partitioned snapshots append partition-aware: the staged
    // write is partitioned by the table's own layout and its leaf files
    // merge into the linked tree below (new partition VALUES create new
    // dirs); flat snapshots are the partCols = Nil special case
    val partCols = partitionColsOf(f, dir)
    // generated columns: compute absent ones, validate provided ones (the
    // overwrite path's rule, applied to the appended rows)
    val gens = readGeneratedPath(spark, dir)
    val provided = gens.filter { case (n, _) =>
      df.columns.exists(_.equalsIgnoreCase(n)) }
    val dfGen = fillIdentityColumns(spark,
      gens.foldLeft(df) { case (d, (n, e)) =>
        if (d.columns.exists(_.equalsIgnoreCase(n))) d
        else d.withColumn(n, org.apache.spark.sql.functions.expr(e))
      }, dir, f)
    // strict schema-on-append: INSERT can never evolve the table (the
    // partitioned read's schema includes the partition columns, so the
    // insert must carry them, matching the inferred partition types)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(x => x.name.toLowerCase -> x.dataType).toMap
    // same sidecar fast path as overwritePath: flat snapshots answer the
    // schema check from one small file instead of a footer-inference job
    val curSchema = (if (partCols.isEmpty)
        graft.merge.PartitionedMerge.schemaOf(spark, dir) else None)
      .getOrElse(spark.read.parquet(dir).schema)
    val (curShape, nwShape) = (shape(curSchema), shape(dfGen.schema))
    require(curShape == nwShape,
      s"INSERT INTO $dir schema mismatch: table has " +
        curShape.keys.toSeq.sorted.mkString(", ") + "; insert carries " +
        nwShape.keys.toSeq.sorted.mkString(", "))
    // normalize to the TABLE's column order and case before writing: the
    // shape check above is order/case-insensitive, so without this a
    // reordered or differently-cased insert would land parquet files
    // whose physical schema disagrees with the table's — and (ADVICE r8)
    // re-stamp the canonical sidecar with the insert frame's shape
    val dfNorm = dfGen.select(curSchema.fields.map { fld =>
      org.apache.spark.sql.functions.col(
        dfGen.columns.find(_.equalsIgnoreCase(fld.name)).get).as(fld.name)
    }.toSeq: _*)
    val stage = stagingPath(dir, "-insert")
    val sw = dfNorm.write.mode(SaveMode.Overwrite)
    (if (partCols.nonEmpty) sw.partitionBy(partCols: _*) else sw)
      .parquet(stage.toString)
    val cons = readConstraintsPath(spark, dir) ++
      provided.map { case (n, e) => (s"__generated_$n", s"`$n` <=> ($e)") }
    if (cons.nonEmpty) {
      try enforce(spark.read.parquet(stage.toString), cons, dir)
      catch { case e: Throwable => f.delete(stage, true); throw e }
    }
    // build the next snapshot: links to every current data file + the new
    // files moved in (staged part-file names carry task UUIDs; a collision
    // with a linked name aborts rather than overwrites)
    val tmp = stagingPath(dir, "")
    f.mkdirs(tmp)
    linkDataTree(f, conf, dst, tmp)
    // a DV sidecar rides along unchanged: linked files keep their names,
    // so recorded positions stay valid and appended rows are untouched
    val dvDir = new Path(dst, graft.layout.DeletionVectors.DvDirName)
    if (f.exists(dvDir))
      org.apache.hadoop.fs.FileUtil.copy(f, dvDir,
        f, new Path(tmp, graft.layout.DeletionVectors.DvDirName),
        false, false, conf)
    mergeStagedTree(f, stage, tmp)
    f.delete(stage, true)
    // carry the skipping manifest forward: the linked files keep their
    // names so their stats stay valid; the appended files are simply
    // unprofiled (always read — stats can only cost IO, never rows) until
    // the next analyzeIncremental
    val skipDir = new Path(dst, "_skipping")
    if (f.exists(skipDir))
      org.apache.hadoop.fs.FileUtil.copy(f, skipDir,
        f, new Path(tmp, "_skipping"), false, false, conf)
    // re-stamp the schema sidecar from the TABLE's schema (sidecar when
    // present, else inferred), not the insert frame's: the shape check
    // above is case/order/nullability-insensitive, so stamping dfGen
    // would let a reordered or differently-cased insert silently rewrite
    // the table's canonical recorded schema for later consumers
    // (ChangeFeed's append fast path, empty-slice frames)
    if (partCols.isEmpty)
      graft.merge.PartitionedMerge.writeSchemaSidecar(spark, tmp.toString,
        curSchema)
    commitSwap(spark, f, dir, tmp, keepVersions, Some(stagedAgainst),
      commitTag, operation)
    }
  }
}
