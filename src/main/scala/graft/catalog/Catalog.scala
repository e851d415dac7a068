package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
  * renames current → `.prev` and tmp → current. On HDFS/local FS rename is
  * atomic per directory move, so a reader resolving the path either sees the
  * old or the new snapshot, never a half-written one; `.prev` is the
  * crash-recovery fallback. (On S3-like stores a manifest-pointer commit
  * would replace the rename pair — same protocol, different primitive.)
  */
class Catalog(spark: SparkSession, warehouse: String) {
  val layers: Seq[String] = Seq("bronze", "silver", "gold")

  def path(layer: String, table: String): String = s"$warehouse/$layer/$table"

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(layer: String, table: String): Boolean =
    fs.exists(new Path(path(layer, table)))

  def read(layer: String, table: String): DataFrame =
    spark.read.parquet(path(layer, table))

  /** One-version time travel: the snapshot replaced by the most recent
    * overwrite (Delta `VERSION AS OF` reduced to depth 1 — the `.prev`
    * dir the swap protocol already retains for crash recovery). */
  def readPrevious(layer: String, table: String): DataFrame =
    spark.read.parquet(path(layer, table) + ".prev")

  def hasPrevious(layer: String, table: String): Boolean =
    fs.exists(new Path(path(layer, table) + ".prev"))

  /** First-load create (the reference's `saveAsTable` path,
    * Gold_Customers.py:65-68). */
  def create(df: DataFrame, layer: String, table: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.ErrorIfExists)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(layer, table))
  }

  /** Snapshot overwrite with atomic swap (replaces Delta's transactional
    * overwrite, Silver_Customers.py:41). */
  def overwriteSnapshot(df: DataFrame, layer: String, table: String,
      partitionBy: Seq[String] = Nil): Unit = {
    Catalog.overwritePath(spark, df, path(layer, table), partitionBy)
    if (tableExists(layer, table))
      spark.catalog.refreshTable(s"$layer.$table")
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
}

object Catalog {
  /** The swap protocol on a raw table directory (shared by the layer.table
    * API above and SQL surfaces that resolve a table to its location, e.g.
    * `graft.sql.MergeIntoSql`): write to `<dir>.tmp`, retire current to
    * `<dir>.prev`, rename tmp → current. Aborts on a failed retire rename —
    * Hadoop rename INTO a still-existing directory nests the new snapshot
    * inside the old one, silently corrupting the table. */
  def overwritePath(spark: SparkSession, df: DataFrame, dir: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val dst = new Path(dir)
    val tmp = new Path(dir + ".tmp")
    val prev = new Path(dir + ".prev")
    val f = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(tmp)) f.delete(tmp, true)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)
    if (f.exists(prev)) f.delete(prev, true)
    if (f.exists(dst) && !f.rename(dst, prev))
      throw new IllegalStateException(
        s"snapshot swap failed for $dst: could not retire current to $prev")
    if (!f.rename(tmp, dst))
      throw new IllegalStateException(s"snapshot swap failed for $dst")
    // Cached relations (file lists) outlive the swap; without a refresh,
    // readers keep resolving the retired snapshot's deleted files.
    spark.catalog.refreshByPath(dst.toString)
  }
}
