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
  *      swaps ONLY those bucket directories into place (previous dirs kept
  *      as dot-prefixed `.prev-…`, invisible to partition discovery, until
  *      the next merge of the same bucket).
  *
  * Crash consistency matches Catalog.overwriteSnapshot's documented
  * posture: per-directory rename is atomic on HDFS/local FS; a crash
  * between renames leaves recoverable `.prev-` dirs (an object store would
  * use a manifest-pointer commit instead).
  */
object PartitionedMerge {

  val BucketCol = "gbucket"

  def bucketExpr(keys: Seq[String], nBuckets: Int): Column =
    pmod(hash(keys.map(col): _*), lit(nBuckets))

  /** Initial (or full) write of the bucket-partitioned table. */
  def write(df: DataFrame, path: String, keys: Seq[String], nBuckets: Int): Unit =
    df.withColumn(BucketCol, bucketExpr(keys, nBuckets))
      .write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(path)

  /** Read the logical table (bucket column dropped). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(BucketCol)

  /** Partition-pruned merge. `mergeFn` receives (prunedTarget, source) and
    * returns the merged slice — e.g.
    * `(t, s) => MergeEngine.scd1(t, s, keys, tracked, skeyBase = Some(read(spark, path)))`.
    * Returns the buckets that were rewritten. */
  def prunedMerge(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String], nBuckets: Int)(
      mergeFn: (DataFrame, DataFrame) => DataFrame): Seq[Int] = {
    val touched = source
      .select(bucketExpr(keys, nBuckets).as(BucketCol)).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val pruned = spark.read.parquet(path)
      .filter(col(BucketCol).isin(touched.map(Int.box): _*))
      .drop(BucketCol)
    val merged = mergeFn(pruned, source)

    val tmp = s"$path.tmp-merge"
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(tmp))) fs.delete(new Path(tmp), true)
    // staging write runs BEFORE any rename, so the (lazy) pruned scan and
    // skeyBase scan still read the original files
    merged.withColumn(BucketCol, bucketExpr(keys, nBuckets))
      .write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(tmp)

    touched.foreach { b =>
      val dst = new Path(s"$path/$BucketCol=$b")
      val src = new Path(s"$tmp/$BucketCol=$b")
      val prev = new Path(s"$path/.prev-$BucketCol=$b")
      if (fs.exists(prev)) fs.delete(prev, true)
      if (fs.exists(dst)) fs.rename(dst, prev)
      if (fs.exists(src) && !fs.rename(src, dst))
        throw new IllegalStateException(s"bucket swap failed for $dst")
    }
    fs.delete(new Path(tmp), true)
    // cached file lists outlive the bucket swap, same as a snapshot swap
    spark.catalog.refreshByPath(path)
    touched
  }
}
