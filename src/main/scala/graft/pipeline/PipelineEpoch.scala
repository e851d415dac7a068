package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.Catalog

/** Cross-table PIPELINE EPOCHS — the consistency layer the per-table
  * version log cannot give on its own. Every [[PipelineGraph]] node
  * commits atomically, but a multi-table run commits node BY node: a
  * reader that lands between the dim commit and the fact commit joins
  * new dims against the old fact — mixed generations. (Delta has the
  * same gap; multi-table transactions are exactly what its commit
  * protocol does not cover.)
  *
  * The epoch closes it with one more pointer, one level up:
  *
  *   - after ALL node commits succeed, [[commit]] stages a MANIFEST
  *     (every persisted node's table → its committed version, read from
  *     the per-table version pointers), renames it to
  *     `epoch_v{N}` (put-if-absent — racing runs serialize exactly like
  *     table swaps), then advances the `_current` epoch pointer;
  *   - [[read]] resolves a table THROUGH the current epoch: pointer →
  *     manifest → `VERSION AS OF` that recorded version
  *     ([[Catalog.versionRead]] — flat snapshots read the resolved dir,
  *     bucketed tables reconstruct from the retire log). Every table a
  *     reader touches through the same epoch is the same generation —
  *     all-old or all-new, never mixed.
  *
  * Crash windows, all safe:
  *   - crash mid-run (some nodes committed, epoch not): the pointer
  *     still names the previous epoch — epoch readers keep seeing the
  *     complete OLD generation while direct table reads see the usual
  *     per-table freshness; the re-run recommits and publishes;
  *   - crash between the manifest rename and the pointer write: the
  *     staged manifest is complete (it was fully written before its
  *     rename), so the next committer publishes it before claiming the
  *     following number — nothing is lost, nothing partial is ever
  *     addressable.
  *
  * Retention: an epoch's versions stay readable as long as the
  * per-table version log retains them (the catalog's `keepVersions`,
  * same contract as `VERSION AS OF`). Size an epoch-reading consumer's
  * lag accordingly.
  *
  * Scale shape: the manifest is O(#nodes) driver-side metadata (a few
  * dozen lines); commit adds one file create + two renames per RUN —
  * nothing per row, nothing per partition. */
object PipelineEpoch {
  private def epochsDir(cat: Catalog, pipeline: String): String =
    cat.path("_pipeline_epochs", pipeline)

  private def pointerFile(dir: String) = new Path(dir, "_current")

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSmall(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new Array[Byte](4096)
      var n = in.read(b)
      while (n > 0) { buf.write(b, 0, n); n = in.read(b) }
      new String(buf.toByteArray, "UTF-8").trim
    } finally in.close()
  }

  /** The published epoch number (0 = none committed yet). */
  def currentEpoch(spark: SparkSession, cat: Catalog,
      pipeline: String): Int = {
    val dir = epochsDir(cat, pipeline)
    val f = fsOf(spark, dir)
    val p = pointerFile(dir)
    // delete-then-rename pointer commit has a transient missing window —
    // same retry discipline as SwapProtocol.readPointer
    var i = 0
    while (i < 100) {
      try {
        if (f.exists(p)) return readSmall(f, p).toInt
        else if (!f.exists(new Path(dir))) return 0
        else if (i > 10) { // pointer genuinely absent: derive from manifests
          val staged = listManifests(f, dir)
          return if (staged.isEmpty) 0 else staged.max
        }
      } catch { case _: java.io.FileNotFoundException => () }
      i += 1; Thread.sleep(2)
    }
    0
  }

  private def listManifests(f: FileSystem, dir: String): Seq[Int] =
    if (!f.exists(new Path(dir))) Nil
    else f.listStatus(new Path(dir)).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("epoch_v"))
      .flatMap(n => n.stripPrefix("epoch_v").toIntOption)

  private def writePointer(f: FileSystem, dir: String, v: Int): Unit = {
    val tmp = new Path(dir,
      "_current.tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val p = pointerFile(dir)
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new IllegalStateException(s"could not commit epoch pointer $p")
  }

  /** Record every table's CURRENT version under the next epoch number
    * and publish it. Returns the committed epoch. Concurrency-safe: the
    * manifest rename is put-if-absent, so racing runs take consecutive
    * numbers; a predecessor's published-but-unpointed manifest is
    * published first (see crash windows above). */
  def commit(spark: SparkSession, cat: Catalog, pipeline: String,
      tables: Seq[String]): Int = {
    val dir = epochsDir(cat, pipeline)
    val f = fsOf(spark, dir)
    f.mkdirs(new Path(dir))
    val manifest = tables.sorted.map { t =>
      val Array(layer, tbl) = t.split('.')
      s"$t\t${cat.currentVersion(layer, tbl)}"
    }.mkString("\n")
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      val cur = currentEpoch(spark, cat, pipeline)
      val next = cur + 1
      val target = new Path(dir, s"epoch_v$next")
      if (f.exists(target)) {
        // a committer crashed between its manifest rename and pointer
        // write: the manifest is complete — publish, then retry ours
        writePointer(f, dir, next)
      } else {
        val tmp = new Path(dir,
          ".epoch-" + java.util.UUID.randomUUID().toString.take(8))
        val out = f.create(tmp, true)
        try out.write(manifest.getBytes("UTF-8")) finally out.close()
        if (f.rename(tmp, target)) { // put-if-absent claim of this number
          writePointer(f, dir, next)
          return next
        } else f.delete(tmp, false) // lost the race — renumber and retry
      }
    }
    throw new IllegalStateException(
      s"could not commit pipeline epoch for '$pipeline' after $attempts " +
        "attempts (sustained contention)")
  }

  /** The table → version map a given epoch recorded. */
  def tableVersions(spark: SparkSession, cat: Catalog, pipeline: String,
      epoch: Int): Map[String, Int] = {
    val dir = epochsDir(cat, pipeline)
    val f = fsOf(spark, dir)
    val p = new Path(dir, s"epoch_v$epoch")
    require(f.exists(p), s"epoch $epoch of pipeline '$pipeline' not found")
    readSmall(f, p).split('\n').filter(_.nonEmpty).map { line =>
      val Array(t, v) = line.split('\t')
      t -> v.toInt
    }.toMap
  }

  /** Epoch-resolved read: `layer.table` AT the version the CURRENT epoch
    * recorded — all tables read through one epoch are one generation.
    * Fails if no epoch is committed yet, if the table is not in the
    * manifest, or if the recorded version fell out of the per-table
    * retention window (the `VERSION AS OF` contract). */
  def read(spark: SparkSession, cat: Catalog, pipeline: String,
      name: String): DataFrame =
    readAt(spark, cat, pipeline, name,
      currentEpoch(spark, cat, pipeline))

  /** [[read]] pinned to an explicit epoch — lets one consumer hold a
    * consistent generation across many reads even while new epochs
    * publish underneath it. */
  def readAt(spark: SparkSession, cat: Catalog, pipeline: String,
      name: String, epoch: Int): DataFrame = {
    require(epoch > 0, s"pipeline '$pipeline' has no committed epoch")
    val versions = tableVersions(spark, cat, pipeline, epoch)
    val v = versions.getOrElse(name, throw new IllegalArgumentException(
      s"table '$name' is not part of pipeline '$pipeline' " +
        s"(epoch $epoch records: ${versions.keys.toSeq.sorted.mkString(", ")})"))
    require(v > 0, s"table '$name' did not exist at epoch $epoch")
    val Array(layer, tbl) = name.split('.')
    Catalog.versionRead(spark, cat.path(layer, tbl), v)
  }
}
