package graft.merge

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-partitioned managed table with partition-pruned merge — the
  * vanilla-Spark equivalent of Delta MERGE's file pruning (the 100 TB-scale
  * follow-up called out in SURVEY.md §4.3 / §7.3).
  *
  * Layout: the table is directory-partitioned by `gbucket =
  * pmod(hash(keys), nBuckets)`. A merge then:
  *   1. collects the source's distinct buckets (metadata-scale: ≤ nBuckets
  *      ints — the one driver-side collect, bounded by construction);
  *   2. scans the target WITH a partition filter on those buckets — the
  *      FileIndex prunes untouched directories, so merge I/O is
  *      O(touched partitions), not O(table);
  *   3. runs the ordinary [[MergeEngine]] program over the pruned slice
  *      (global surrogate-key high-water via `skeyBase` on the full table —
  *      a column-pruned scan of one long column);
  *   4. stages the merged buckets to `<path>.tmp-merge` and atomically
  *      swaps ONLY those bucket directories into place, retiring each
  *      replaced dir into the table's `<path>.history/v{N}` version log —
  *      the same N-deep log Catalog snapshots keep, holding just the
  *      CHANGED buckets per version, so bucketed dims are time-travelable
  *      at O(touched) history cost per merge.
  *
  * Crash consistency matches Catalog.overwriteSnapshot's documented
  * posture: per-directory rename is atomic on HDFS/local FS; the version
  * pointer advances only after every touched bucket is swapped, and a
  * crashed swap's half-retired buckets are rolled back by the next merge
  * (an object store would use a manifest-pointer commit instead).
  */
object PartitionedMerge {

  private def admittedLive(only: Option[Set[String]], name: String) =
    only.forall(_.contains(name))

  val BucketCol = "gbucket"

  def bucketExpr(keys: Seq[String], nBuckets: Int): Column =
    pmod(hash(keys.map(col): _*), lit(nBuckets))

  /** Initial (or full) write of the bucket-partitioned table. */
  def write(df: DataFrame, path: String, keys: Seq[String], nBuckets: Int): Unit = {
    // a constraint recorded before first load gates the initial data too
    // (the Catalog.create parity)
    val cons = graft.catalog.Catalog.readConstraintsPath(df.sparkSession, path)
    if (cons.nonEmpty) graft.catalog.Catalog.enforce(df, cons, path)
    val bucketed = df.withColumn(BucketCol, bucketExpr(keys, nBuckets))
    bucketed.write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(path)
    writeSchemaSidecar(df.sparkSession, path, bucketed.schema)
    writeBucketMeta(df.sparkSession, path, keys, nBuckets)
    stampCommitTime(df.sparkSession, path, 1)
    // stamp the pointer at creation. A pointer-less bucketed table (the
    // history dir exists for the commit-time marker, the `_current` file
    // doesn't) costs every pre-first-merge readPointer the full
    // pointer-absent retry loop — and makes the FIRST swap's crash window
    // unrecoverable: readPointer would derive live = logged.max + 1 = 2
    // from the in-flight v00001 retire entries, so recoverAbortedSwap
    // would look at v00002 and never roll the half-retired buckets back.
    val fsw = new Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    graft.catalog.Catalog.writePointer(fsw, path, 1)
  }

  /** Read the logical table (bucket column dropped, deletion vectors
    * applied — a bucketed table can carry per-bucket `_dv` sidecars from
    * merge-on-read DML, see [[graft.layout.BucketedDml]]). */
  def read(spark: SparkSession, path: String): DataFrame = {
    // heal BEFORE the scan lists the live tree: readRaw resolves files
    // eagerly, so a post-hoc probe could not bring a rolled-back bucket
    // into THIS read's plan
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    healCrashedSwap(spark, fs, path)
    applyBucketDvs(spark, path, readRaw(spark, path)).drop(BucketCol)
  }

  /** Subtract per-bucket deletion-vector positions from a frame read off
    * this table's LIVE bucket dirs. The sidecar probe comes from the
    * per-version [[graft.layout.ReadProbeCache]] — no-sidecar reads (the
    * overwhelmingly common case) cost zero FS round-trips beyond the
    * pointer read after the first probe of a version (VERDICT r7 #1). */
  private[graft] def applyBucketDvs(spark: SparkSession, path: String,
      df: DataFrame): DataFrame = {
    val pr = graft.layout.ReadProbeCache.probe(spark, path)
    // flat tables have no per-bucket sidecars by construction; their root
    // `_dv` (if any) is the flat read path's job, not this one's
    val dvDirs = if (pr.isBucketed) pr.dvDirs else Nil
    if (dvDirs.isEmpty) df
    else graft.layout.DeletionVectors.subtractBucketPositions(df,
      graft.layout.DeletionVectors.bucketDvFrame(spark, dvDirs))
  }

  /** The live `gbucket=` directories under `path`. */
  private[graft] def liveBucketDirs(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[Path] = {
    val root = new Path(path)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(s"$BucketCol=")).toSeq
  }

  /** Bucket-layout metadata (hash keys, bucket count), persisted as a
    * sibling `<path>.buckets` manifest the way constraints are: a property
    * of the TABLE that survives snapshot swaps. Row-routing writes (INSERT
    * INTO, UPDATE that reassigns a key column) need it to compute
    * `pmod(hash(keys), n)` for new/moved rows; tables written before the
    * manifest existed simply don't support those (clear error, never a
    * mis-routed row). */
  private def bucketMetaFile(path: String) = new Path(path + ".buckets")

  private[graft] def writeBucketMeta(spark: SparkSession, path: String,
      keys: Seq[String], nBuckets: Int): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = bucketMetaFile(path)
    val tmp = new Path(path + ".buckets.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"${keys.mkString(",")}\t$nBuckets".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"bucket meta commit failed: $dst")
  }

  private[graft] def readBucketMeta(spark: SparkSession, path: String)
      : Option[(Seq[String], Int)] = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = bucketMetaFile(path)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val line =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val i = line.indexOf('\t')
    Some((line.substring(0, i).split(",").toSeq.map(_.trim),
      line.substring(i + 1).trim.toInt))
  }

  /** Per-version commit times for bucketed tables. A flat snapshot's
    * version dir is written once and only ever renamed, so its mtime IS
    * the commit time; a bucketed retire entry is created when the NEXT
    * version commits, so directory times date the wrong version. Instead
    * every pointer advance stamps `historyDir/_commit_time_v{N}` — the
    * record `TIMESTAMP AS OF` resolution reads. */
  private[graft] def commitTimeMarker(path: String, v: Int): Path =
    new Path(graft.catalog.Catalog.historyDir(path), s"_commit_time_v$v")

  private[graft] def stampCommitTime(spark: SparkSession, path: String,
      v: Int): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(graft.catalog.Catalog.historyDir(path))
    val out = fs.create(commitTimeMarker(path, v), true)
    try out.write(String.valueOf(System.currentTimeMillis())
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** (version, commit millis) for every stamped version of a bucketed
    * table, oldest first. Tables written before stamping existed return
    * only the versions committed since. */
  private[graft] def commitTimes(spark: SparkSession, path: String)
      : Seq[(Int, Long)] = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hist = graft.catalog.Catalog.historyDir(path)
    if (!fs.exists(hist)) return Nil
    fs.listStatus(hist).map(_.getPath)
      .filter(_.getName.startsWith("_commit_time_v"))
      .flatMap { p =>
        val v = p.getName.stripPrefix("_commit_time_v")
        if (v.nonEmpty && v.forall(_.isDigit)) {
          val in = fs.open(p)
          val t =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          Some((v.toInt, t.toLong))
        } else None
      }.sortBy(_._1).toSeq
  }

  /** Schema sidecar: a `partitionBy` write of ZERO rows produces no
    * bucket directories and no part files — nothing for a later read to
    * infer a schema from — yet an empty state is legitimate (a merge can
    * delete every row; an incremental view can empty). Every write
    * records the bucketed schema in an underscore-prefixed sidecar
    * (invisible to parquet scans), and [[readRaw]] falls back to it
    * exactly when inference has no files. Delta holds the schema in its
    * log for the same reason; here the sidecar IS that log entry. */
  private def schemaSidecar(path: String) = new Path(path, "_graft_pm_schema.json")

  private[graft] def writeSchemaSidecar(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = schemaSidecar(path)
    val tmp = new Path(path, "_graft_pm_schema.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p), s"schema sidecar commit failed: $p")
  }

  /** The sidecar-recorded schema of the table at `path`, if one was ever
    * written — ONE small-file read, no listing, no footer job. The
    * driver-side answer to "what columns does this table have" for every
    * caller that doesn't need the data (schema-on-write checks, fk-type
    * resolution); `None` falls back to ordinary inference. */
  private[graft] def schemaOf(spark: SparkSession, path: String)
      : Option[org.apache.spark.sql.types.StructType] = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sc = schemaSidecar(path)
    if (!fs.exists(sc)) None
    else {
      val in = fs.open(sc)
      val json =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }

  /** The raw bucketed frame (bucket column included), schema-safe for
    * file-less (emptied) states. */
  private[graft] def readRaw(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch { case e: org.apache.spark.sql.AnalysisException =>
      schemaOf(spark, path) match {
        case None => throw e
        case Some(sch) => spark.read.schema(sch).parquet(path)
      }
    }

  /** Partition-pruned merge. `mergeFn` receives (prunedTarget, source) and
    * returns the merged slice — e.g.
    * `(t, s) => MergeEngine.scd1(t, s, keys, tracked, skeyBase = Some(read(spark, path)))`.
    * Returns the buckets that were rewritten.
    *
    * Each merge is a table version: the touched buckets' pre-merge dirs are
    * retired into the same `<path>.history/v{N}` + `_current` pointer log
    * Catalog snapshots use (only the CHANGED buckets are moved — per-merge
    * history cost is O(touched), the Delta-manifest property), so bucketed
    * dims are time-travelable through [[readVersion]] and SQL
    * `VERSION AS OF`. */
  def prunedMerge(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String], nBuckets: Int, keepVersions: Int = 10)(
      mergeFn: (DataFrame, DataFrame) => DataFrame): Seq[Int] = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAbortedSwap(spark, fs, path)
    // optimistic concurrency: everything from here reads live state the
    // staged merge derives from — record the version staged against
    val stagedAgainst = graft.catalog.Catalog.readPointer(fs, path)
    val touched = source
      .select(bucketExpr(keys, nBuckets).as(BucketCol)).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    // Empty source ⟹ no touched buckets ⟹ nothing to merge: return
    // without staging, swapping, or burning a version number. This is
    // ALSO the callers' emptiness probe — an incremental-view consumer
    // (MaterializedJoin/Agg) used to run its own `source.isEmpty` job
    // first, evaluating the full source plan once for the probe and
    // again here; the collect above already answers it (VERDICT r7 #1:
    // per-refresh constant cost).
    if (touched.isEmpty) return Nil
    // DV-applied: a bucketed table can carry per-bucket `_dv` sidecars
    // from merge-on-read DML — merging over a raw read would resurrect
    // deleted rows into the rewritten buckets. The rewrite FOLDS the
    // touched buckets' sidecars away (they retire with the old dirs).
    //
    // The pruned read LISTS only the touched bucket dirs (basePath keeps
    // the partition column): the old whole-table read + isin filter let
    // partition pruning skip the DATA but still paid an O(all files)
    // driver-side listing per merge — the Delta large-checkpoint trap at
    // 10⁶ files, and a measurable constant at any size (VERDICT r7 #1).
    val touchedDirs = touched
      .map(b => new Path(s"$path/$BucketCol=$b"))
      .filter(fs.exists).map(_.toString)
    val prunedRaw =
      if (touchedDirs.isEmpty) {
        // all-new keys: none of the touched buckets exist yet — an empty
        // slice with the table's recorded schema
        val sch = schemaOf(spark, path).getOrElse(readRaw(spark, path).schema)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sch)
      } else spark.read.option("basePath", path).parquet(touchedDirs: _*)
    val pruned = applyBucketDvs(spark, path, prunedRaw).drop(BucketCol)
    val merged = mergeFn(pruned, source)

    // unique per-attempt staging (vacuum's `.tmp` prefix sweep reclaims
    // abandoned attempts). Concurrent bucketed merges are EXCLUSIVE but
    // SAFE (round 11): the swap checks `stagedAgainst` and claims the
    // version transition, so a racer loses with the typed conflict
    // instead of corrupting history — commitWithRetry serializes them.
    val tmp = s"$path.tmp-merge-" +
      java.util.UUID.randomUUID().toString.take(8)
    // staging write runs BEFORE any rename, so the (lazy) pruned scan and
    // skeyBase scan still read the original files
    val staged = merged.withColumn(BucketCol, bucketExpr(keys, nBuckets))
    staged.write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(tmp)

    // CHECK constraints gate bucketed writes too: validate the staged
    // buckets (the only rows this merge changes) before any rename —
    // same one-pass check as Catalog.overwritePath, scoped O(touched).
    // Explicit schema: a merge that deleted every touched row stages a
    // file-less tree.
    val cons = graft.catalog.Catalog.readConstraintsPath(spark, path)
    if (cons.nonEmpty) {
      try graft.catalog.Catalog.enforce(
        spark.read.schema(staged.schema).parquet(tmp).drop(BucketCol),
        cons, path)
      catch { case e: Throwable =>
        fs.delete(new Path(tmp), true); throw e }
    }

    swapBuckets(spark, fs, path, tmp, touched, keepVersions,
      Some(stagedAgainst))
    writeSchemaSidecar(spark, path, staged.schema)
    // legacy upgrade: a merge knows the layout, so tables written before
    // the bucket-meta manifest existed gain it on their next merge
    if (readBucketMeta(spark, path).isEmpty)
      writeBucketMeta(spark, path, keys, nBuckets)
    touched
  }

  /** The versioned bucket rotation shared by merge and compaction: retire
    * each touched live bucket dir into `<path>.history/v{cur}` (an empty
    * marker dir when the bucket did not exist — reconstruction reads that
    * as "absent at this version"), rename the staged dir in, THEN advance
    * the pointer. A crash before the pointer write leaves the table
    * addressable at the old version; [[recoverAbortedSwap]] rolls the
    * half-moved buckets back on the next merge.
    *
    * Optimistic concurrency (round 11 — closes the documented
    * single-writer corruption): `expectedVersion` is the pointer the
    * caller read BEFORE its first live-state read — if the table moved,
    * the staged work was derived from a superseded version and
    * committing would silently drop the interleaved writer's changes,
    * so the staging is discarded and the typed conflict raised (the
    * flat protocol's `commitSwap` rule). Two racers that both pass the
    * check still cannot interleave their retires into the same
    * `v{cur}`: the transition is CLAIMED first via a rename-to-claim
    * put-if-absent (the same primitive the flat retire rename plays) —
    * the loser gets the typed conflict with its staging deleted and
    * live state untouched. A crashed claimant's marker is swept by
    * [[recoverAbortedSwap]] (unconditionally for completed transitions,
    * age-gated by [[HealGraceMs]] for the in-flight one — the same
    * liveness trade the heal path documents). With
    * [[graft.catalog.Catalog.commitWithRetry]] around the caller,
    * concurrent bucketed writers SERIALIZE safely instead of
    * corrupting history. */
  private[graft] def swapBuckets(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, tmp: String,
      touched: Seq[Int], keepVersions: Int,
      expectedVersion: Option[Int] = None): Unit = {
    import graft.catalog.Catalog
    val cur = Catalog.readPointer(fs, path)
    expectedVersion.filter(_ != cur).foreach { exp =>
      fs.delete(new Path(tmp), true)
      throw new Catalog.ConcurrentCommitException(path, exp, cur)
    }
    val hist = Catalog.historyDir(path)
    fs.mkdirs(hist)
    val claim = new Path(hist, s"_swap_claim_v$cur")
    val uniq = new Path(hist,
      s".claim-${java.util.UUID.randomUUID().toString.take(8)}")
    fs.create(uniq, true).close()
    // link-based put-if-absent (SwapProtocol.publishIfAbsent): the old
    // rename-to-claim relied on ChecksumFileSystem's exists-check +
    // POSIX rename, which two racers can interleave (both "win") —
    // link(2) is kernel-atomic
    if (!graft.layout.SwapProtocol.publishIfAbsent(fs, uniq, claim)) {
      fs.delete(new Path(tmp), true)
      throw new Catalog.ConcurrentCommitException(path)
    }
    // Close the claim-release TOCTOU: a winner at this same version may
    // have advanced the pointer and released its claim BETWEEN our
    // pointer read above and the rename-to-claim — the rename then
    // succeeds onto the now-absent name even though `cur` is stale.
    // The claim makes this check race-free: nobody else can advance the
    // v{cur}→v{cur+1} transition while we hold it, so a re-read that
    // still equals `cur` proves the read was not superseded.
    val recheck = Catalog.readPointer(fs, path)
    if (recheck != cur) {
      fs.delete(claim, false)
      fs.delete(new Path(tmp), true)
      throw new Catalog.ConcurrentCommitException(path, cur, recheck)
    }
    val retireRoot = Catalog.versionDir(path, cur)
    fs.mkdirs(retireRoot)
    touched.foreach { b =>
      // heartbeat: a live claimant refreshes its claim's mtime on every
      // bucket it processes, so recoverAbortedSwap's age-gated sweep only
      // ever evicts a genuinely stalled writer, not a slow-but-alive one
      // working through many buckets (the sweep's grace is per-bucket,
      // not per-swap)
      try fs.setTimes(claim, System.currentTimeMillis(), -1)
      catch { case _: java.io.IOException => () } // swept ⇒ stage-in fails loudly
      val dst = new Path(s"$path/$BucketCol=$b")
      val src = new Path(s"$tmp/$BucketCol=$b")
      val retired = new Path(retireRoot, s"$BucketCol=$b")
      // an entry under v{cur} can only be an aborted attempt at THIS
      // transition (a completed one advances the pointer) — clear it
      if (fs.exists(retired)) fs.delete(retired, true)
      if (fs.exists(dst)) {
        if (!fs.rename(dst, retired))
          throw new IllegalStateException(s"bucket retire failed for $dst")
      } else fs.mkdirs(retired) // bucket absent before this version
      if (fs.exists(src)) {
        // Reader-side heal can roll this swap back if the writer stalls
        // past HealGraceMs between the retire above and this stage-in:
        // the live dir REAPPEARS, and RawLocalFileSystem.rename onto an
        // existing non-empty dir falls back to copy-INTO-child
        // (bucket=b/bucket=b nesting) and returns true — the one path
        // that could advance the pointer over a corrupted bucket. Fail
        // loudly instead; the caller retries the merge, which starts from
        // recoverAbortedSwap and finds a consistent tree.
        if (fs.exists(dst))
          throw new IllegalStateException(
            s"bucket swap pre-empted for $dst: live dir reappeared " +
              s"(reader-side heal rolled back a swap stalled past " +
              s"${HealGraceMs}ms; raise -Dgraft.heal.graceMs on stall-prone " +
              "hosts) — retry the merge")
        if (!fs.rename(src, dst))
          throw new IllegalStateException(s"bucket swap failed for $dst")
        // heal racing BETWEEN the check and the rename leaves the staged
        // dir NESTED under the restored live dir — detect, remove, fail
        val nested = new Path(dst, src.getName)
        if (fs.exists(nested)) {
          fs.delete(nested, true)
          throw new IllegalStateException(
            s"bucket swap for $dst nested under a heal-restored live dir " +
              "— removed the nested copy; retry the merge")
        }
      }
    }
    fs.delete(new Path(tmp), true)
    Catalog.writePointer(fs, path, cur + 1)
    // transition complete — release the claim (a crash before this
    // leaves a claim for a version < the new pointer, which the next
    // recoverAbortedSwap sweeps unconditionally)
    fs.delete(claim, false)
    // date the new version for TIMESTAMP AS OF (retire-entry mtimes date
    // the NEXT commit, not the version they hold — see commitTimeMarker)
    stampCommitTime(spark, path, cur + 1)
    // prune the one entry that just left the retention window (reads at
    // versions <= it are no longer reconstructible; orphans from a lowered
    // keepVersions or a released epoch pin are vacuum's job — same
    // contract as Catalog snapshots)
    if (cur - keepVersions >= 1 &&
        !Catalog.epochPinProtects(spark, fs, path, cur - keepVersions)) {
      val old = Catalog.versionDir(path, cur - keepVersions)
      if (fs.exists(old)) fs.delete(old, true)
      val marker = commitTimeMarker(path, cur - keepVersions)
      if (fs.exists(marker)) fs.delete(marker, false)
    }
    // cached file lists outlive the bucket swap, same as a snapshot swap
    spark.catalog.refreshByPath(path)
  }

  /** READ-side self-healing for the crash window writers recover lazily:
    * between a crashed writer's retire renames and the next write's
    * [[recoverAbortedSwap]], a bucket sits in `v{current}` with NO live
    * dir — and a scan of the live tree would SILENTLY drop its rows (the
    * one partial-data window in the protocol; flat tables fail loudly
    * instead because their whole snapshot dir is gone). Every read path
    * calls this first: one `exists` on the in-flight version dir answers
    * the steady state; when missing-live entries are found, a HEALTHY
    * writer mid-swap is identified by FRESHNESS (each retire rename
    * touches the in-flight dir's mtime) and left alone; a state stale
    * past [[HealGraceMs]] is a crashed writer — recovered inline, epoch
    * bumped, so every process re-probes. Trade-off, documented: a live
    * writer stalled longer than the grace inside its rename window can
    * have its swap rolled back under it; it then fails its stage-in
    * rename LOUDLY and retries — reader correctness is bought with a
    * writer retry, never silence (swapBuckets checks for a reappeared
    * live dir before AND after the stage-in rename, because a plain
    * rename onto a restored dir would silently nest instead of failing).
    * Hosts with multi-second IO stalls can widen the window with
    * `-Dgraft.heal.graceMs=<millis>`. */
  private[graft] def HealGraceMs: Long =
    sys.props.get("graft.heal.graceMs").flatMap(s =>
      scala.util.Try(s.toLong).toOption).getOrElse(3000L)

  private[graft] def healCrashedSwap(spark: SparkSession,
      path: String): Unit =
    healCrashedSwap(spark, new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), path)

  private[graft] def healCrashedSwap(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    import graft.catalog.Catalog
    val inFlight = Catalog.versionDir(path, Catalog.readPointer(fs, path))
    val st =
      try { if (!fs.exists(inFlight)) return else fs.getFileStatus(inFlight) }
      catch { case _: java.io.FileNotFoundException => return }
    // freshness gates the verdict, not a wait loop: every retire rename
    // updates the in-flight dir's mtime, so a FRESH entry is a live
    // writer mid-swap — reads give it grace and proceed (racing a
    // healthy swap is the rename-layout's known listing window, closed
    // by the writer within ms); an entry stale past HealGraceMs with a
    // missing live dir is a crashed writer, recovered inline.
    if (System.currentTimeMillis() - st.getModificationTime < HealGraceMs)
      return
    val missing = fs.listStatus(inFlight).map(_.getPath)
      .exists(p => p.getName.startsWith(s"$BucketCol=") &&
        !fs.exists(new Path(path, p.getName)))
    if (missing) recoverAbortedSwap(spark, fs, path)
  }

  /** Roll back a swap that crashed before its pointer write: entries under
    * `v{current}` whose live bucket dir is MISSING were retired but never
    * replaced — restore them so the pruned scan reads pre-merge data.
    * Entries whose live dir exists are aborted-attempt leftovers handled at
    * the next retire. */
  private[graft] def recoverAbortedSwap(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    import graft.catalog.Catalog
    val cur = Catalog.readPointer(fs, path)
    // sweep stranded swap claims: one for a COMPLETED transition
    // (version < pointer — the claimant crashed between its pointer
    // write and the release) is garbage unconditionally; one for the
    // in-flight transition is a crashed mid-swap claimant only once it
    // ages past the heal grace — younger claims belong to a LIVE
    // concurrent writer and must be left to win or fail on their own
    val hist = Catalog.historyDir(path)
    if (fs.exists(hist)) fs.listStatus(hist).map(_.getPath)
      .filter(_.getName.startsWith("_swap_claim_v")).foreach { c =>
        val v = c.getName.stripPrefix("_swap_claim_v").toIntOption
        val now = System.currentTimeMillis()
        // the in-flight claim is swept only when BOTH heartbeats are
        // stale: the claim file (refreshed per retire rename) AND the
        // in-flight version dir (touched by each retire landing in it)
        // — a live writer keeps at least one fresh; a claimant that
        // crashed before its first retire has no version dir and the
        // claim's own age decides
        def dirStale: Boolean = {
          val d = Catalog.versionDir(path, cur)
          try now - fs.getFileStatus(d).getModificationTime > HealGraceMs
          catch { case _: java.io.IOException => true } // no dir yet
        }
        val stale = v.exists(_ < cur) ||
          (now - fs.getFileStatus(c).getModificationTime > HealGraceMs &&
            dirStale)
        if (stale) fs.delete(c, false)
      }
    val inFlight = Catalog.versionDir(path, cur)
    if (!fs.exists(inFlight)) return
    // the one same-version mutation in the protocol: bucket dirs (and
    // their _dv sidecars) move without a pointer advance — the cached
    // probe for this version may describe the crashed writer's
    // half-swapped state. Bump + invalidate whenever a missing live
    // entry was DETECTED (not only when a restore rename succeeded: a
    // failed restore leaves the tree half-swapped, and serving the
    // pre-recovery probe for it would hide exactly that). The in-JVM
    // invalidate handles our own readers; the epoch bump makes the
    // mutation observable to OTHER processes, whose probe caches key on
    // (path, version, epoch).
    var missingSeen = false
    try {
      fs.listStatus(inFlight).map(_.getPath)
        .filter(_.getName.startsWith(s"$BucketCol=")).foreach { retired =>
          val dst = new Path(path, retired.getName)
          if (!fs.exists(dst)) {
            missingSeen = true
            // a failed restore rename must surface, not be dropped: the
            // table would keep serving with the bucket's rows missing
            if (!fs.rename(retired, dst))
              throw new IllegalStateException(
                s"crash recovery could not restore $dst from $retired")
          }
        }
    } finally if (missingSeen) {
      Catalog.bumpRecoveryEpoch(fs, path)
      graft.layout.ReadProbeCache.invalidate(path)
    }
  }

  /** Reconstruct table version `v` (bucket column retained). Version v of
    * bucket b is the EARLIEST retire entry `>= v` that holds b — that copy
    * is b's state at every version from its previous change through v — or
    * the live dir when no later merge touched b. An empty retire entry
    * means b did not exist at v. Requires every transition in [v, current)
    * to still be in the retention window. */
  /** The bucket directories that hold table version `v`:
    * `(bucketName, basePath, bucketDir)` per bucket that EXISTED at `v`,
    * each the earliest retire entry `>= v` holding it (that copy is the
    * bucket's state from its previous change through v) or the live dir
    * when no later merge touched it. Shared by [[reconstructVersion]] and
    * `Catalog.clonePath VERSION AS OF` (which links/copies exactly these
    * dirs — per-bucket `_dv` sidecars ride along, so a version clone
    * carries that version's deletion state). */
  private[graft] def versionBucketDirs(spark: SparkSession, path: String,
      v: Int, only: Option[Set[String]] = None): Seq[(String, String, Path)] = {
    import graft.catalog.Catalog
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = Catalog.readPointer(fs, path)
    require(v >= 1 && v <= cur,
      s"version $v out of range for $path (current = $cur)")
    def hasData(p: Path) =
      fs.listStatus(p).exists(!_.getPath.getName.startsWith("_"))
    // v == cur lists the LIVE tree — the same crashed-swap partial-data
    // window read() heals; historical versions are immune (a crashed
    // v{cur} retire entry holds the bucket's state AT cur, which is
    // exactly what reconstruction of any v <= cur should use)
    if (v == cur) healCrashedSwap(spark, path)
    if (v == cur)
      return fs.listStatus(new Path(path)).map(_.getPath)
        .filter(p => p.getName.startsWith(s"$BucketCol=") &&
          admittedLive(only, p.getName))
        .filter(hasData)
        .map(p => (p.getName, path, p)).toSeq
    val missing = (v until cur).filterNot(w =>
      fs.exists(Catalog.versionDir(path, w)))
    require(missing.isEmpty,
      s"version $v of $path was pruned from the log (missing transitions: " +
        missing.mkString(", ") + ")")
    // bucket -> its earliest retire entry at or after v
    def admitted(name: String) = only.forall(_.contains(name))
    val chosen = scala.collection.mutable.LinkedHashMap.empty[String, (String, Path)]
    (v until cur).foreach { w =>
      val vdir = Catalog.versionDir(path, w)
      fs.listStatus(vdir).map(_.getPath)
        .filter(p => p.getName.startsWith(s"$BucketCol=") &&
          admitted(p.getName)).foreach { p =>
          if (!chosen.contains(p.getName))
            chosen(p.getName) = (vdir.toString, p)
        }
    }
    fs.listStatus(new Path(path)).map(_.getPath)
      .filter(p => p.getName.startsWith(s"$BucketCol=") &&
        admitted(p.getName)).foreach { p =>
        if (!chosen.contains(p.getName)) chosen(p.getName) = (path, p)
      }
    // empty retire entry = bucket absent at v
    chosen.toSeq.collect { case (name, (base, p)) if hasData(p) =>
      (name, base, p)
    }
  }

  private[graft] def reconstructVersion(spark: SparkSession, path: String,
      v: Int, only: Option[Set[String]] = None): DataFrame = {
    import graft.layout.DeletionVectors
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = versionBucketDirs(spark, path, v, only)
    val dvDirs = entries
      .map(e => new Path(e._3, DeletionVectors.DvDirName))
      .filter(fs.exists)
    // group by base dir so the partition column survives the read; when
    // any chosen dir carries a `_dv` sidecar, tag physical positions at
    // the RELATION level (the `_metadata` pseudo-column does not resolve
    // through a Union) so the anti-join below can subtract them
    def partOf(base: String, dirs: Seq[Path]): DataFrame = {
      val d = spark.read.option("basePath", base)
        .parquet(dirs.map(_.toString): _*)
      if (dvDirs.isEmpty) d
      else d.withColumn(DeletionVectors.FileCol, col("_metadata.file_name"))
        .withColumn(DeletionVectors.PosCol, col("_metadata.row_index"))
    }
    val parts = entries.groupBy(_._2).toSeq.map { case (base, es) =>
      partOf(base, es.map(_._3)) }
    val df =
      if (parts.isEmpty) readRaw(spark, path).limit(0) // sidecar schema
      else parts.reduce(_.unionByName(_))
    // apply the CHOSEN dirs' own `_dv` sidecars: positions are recorded
    // against (bucket, basename, row), all preserved by retire renames —
    // so each version reads exactly its own deletion state
    if (dvDirs.isEmpty) df
    else {
      val dv = DeletionVectors.bucketDvFrame(spark, dvDirs)
      df.join(dv, df(BucketCol) === dv(BucketCol) &&
          df(DeletionVectors.FileCol) === dv("file_name") &&
          df(DeletionVectors.PosCol) === dv("row_index"), "left_anti")
        .drop(DeletionVectors.FileCol, DeletionVectors.PosCol)
    }
  }

  /** Version-addressed read, [[read]]'s shape (bucket column dropped). */
  def readVersion(spark: SparkSession, path: String, v: Int): DataFrame =
    reconstructVersion(spark, path, v).drop(BucketCol)

  /** OPTIMIZE's bin-packing for the bucketed layout: rewrite every bucket
    * whose file count exceeds what `targetFileSize` calls for into
    * ~target-sized files, as a NEW table version through the same retire
    * protocol as a merge (contents unchanged, history gains a version).
    * One distributed job for all touched buckets: rows are shuffled to
    * `ceil(bucketBytes / target)` groups per bucket, so each bucket lands
    * in at most that many files. Returns the compacted buckets. */
  def compact(spark: SparkSession, path: String, targetFileSize: Long,
      keepVersions: Int = 10): Seq[Int] = {
    require(targetFileSize > 0, "targetFileSize must be positive")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAbortedSwap(spark, fs, path)
    val stagedAgainst = graft.catalog.Catalog.readPointer(fs, path)
    val perBucket = fs.listStatus(new Path(path)).map(_.getPath)
      .filter(_.getName.startsWith(s"$BucketCol="))
      .map { p =>
        val files = fs.listStatus(p)
          .filterNot(_.getPath.getName.startsWith("_"))
        val bytes = files.map(_.getLen).sum
        val want = math.max(1L, (bytes + targetFileSize - 1) / targetFileSize)
        (p.getName.stripPrefix(s"$BucketCol=").toInt, files.length, want.toInt)
      }
    val plan = perBucket.filter { case (_, nFiles, want) => nFiles > want }
      .map { case (b, _, want) => b -> want }.toSeq.sortBy(_._1)
    if (plan.isEmpty) return Nil
    val touched = plan.map(_._1)
    // per-bucket file-count control in one shuffle: a deterministic salt in
    // [0, want_b) per row; repartitioning on (bucket, salt) caps the number
    // of tasks — hence files — holding each bucket at want_b
    val wantFor = plan.foldLeft(lit(1)) { case (acc, (b, want)) =>
      when(col(BucketCol) === b, lit(want)).otherwise(acc)
    }
    // DV-applied: compaction of a bucket folds its `_dv` sidecar into the
    // rewritten files (Delta's PURGE-on-OPTIMIZE), never resurrects
    val df = applyBucketDvs(spark, path, spark.read.parquet(path)
      .filter(col(BucketCol).isin(touched.map(Int.box): _*)))
    val salted = df.withColumn("__graft_salt",
      pmod(hash(struct(df.columns.map(col): _*)), wantFor))
    val tmp = s"$path.tmp-merge-" +
      java.util.UUID.randomUUID().toString.take(8)
    salted.repartition(col(BucketCol), col("__graft_salt"))
      .drop("__graft_salt")
      .write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(tmp)
    swapBuckets(spark, fs, path, tmp, touched, keepVersions,
      Some(stagedAgainst))
    touched
  }

  /** `OPTIMIZE … ZORDER BY` for the bucketed layout: rewrite every bucket
    * with its rows clustered along the Morton curve of `cols` WITHIN the
    * bucket — bucket pruning (equi-key lookups on the hash keys) and
    * z-order file skipping (range/point filters on OTHER columns) compose
    * instead of excluding each other. One distributed job: a single range
    * exchange on (bucket, z) makes each output file cover a contiguous
    * z-range inside one bucket, so per-file min/max footers are tight on
    * all clustered columns. Commits as a new version through the same
    * retire protocol as a merge; per-bucket `_dv` sidecars fold into the
    * rewrite (OPTIMIZE's PURGE rule). Returns the rewritten buckets. */
  def zorderCompact(spark: SparkSession, path: String, cols: Seq[String],
      targetFileSize: Long, keepVersions: Int = 10): Seq[Int] = {
    require(cols.nonEmpty, "ZORDER BY needs at least one column")
    require(targetFileSize > 0, "targetFileSize must be positive")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAbortedSwap(spark, fs, path)
    val stagedAgainst = graft.catalog.Catalog.readPointer(fs, path)
    val buckets = liveBucketDirs(fs, path)
    if (buckets.isEmpty) return Nil
    val touched = buckets
      .map(_.getName.stripPrefix(s"$BucketCol=").toInt).sorted
    val bytes = buckets.flatMap(b => fs.listStatus(b)
      .filterNot(_.getPath.getName.startsWith("_")).map(_.getLen)).sum
    val n = math.max(1L, (bytes + targetFileSize - 1) / targetFileSize).toInt
    val df = applyBucketDvs(spark, path, readRaw(spark, path))
    val zc = "__graft_z"
    val staged = df
      .withColumn(zc, graft.layout.ZOrder.zValue(df, cols))
      .repartitionByRange(n, col(BucketCol), col(zc))
      .sortWithinPartitions(col(BucketCol), col(zc))
      .drop(zc)
    val tmp = s"$path.tmp-merge-" +
      java.util.UUID.randomUUID().toString.take(8)
    staged.write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(tmp)
    swapBuckets(spark, fs, path, tmp, touched, keepVersions,
      Some(stagedAgainst))
    touched
  }
}
