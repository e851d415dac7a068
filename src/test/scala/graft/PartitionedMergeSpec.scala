package graft

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.merge.{MergeEngine, PartitionedMerge}

/** Partition-pruned merge must (a) produce byte-identical results to the
  * full-table merge program and (b) physically leave untouched bucket
  * directories alone — the file-pruning property that makes merge
  * O(touched partitions) at 100 TB. */
class PartitionedMergeSpec extends SparkSuite {

  private val keys = Seq("k")
  private val tracked = Seq("a", "b")
  private val nBuckets = 8
  private val fixedNow = to_timestamp(lit("2026-01-01 12:00:00"))

  private def dim(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"attr$i", i * 10L)).toDF("k", "a", "b")
      .withColumn("customer_skey", col("k") + 1000L)
      .withColumn("created_date", to_timestamp(lit("2025-06-01 00:00:00")))
      .withColumn("updated_date", to_timestamp(lit("2025-06-01 00:00:00")))
      .withColumn("change_type", lit("I"))
      .withColumn("hash_value",
        MergeEngine.nullSafeHash(Seq(col("a"), col("b"))))
  }

  private def fileState(dir: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(dir))
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  test("pruned merge == full merge; untouched buckets physically unchanged") {
    import spark.implicits._
    val path = tmpDir("pmerge") + "/dim"
    val target = dim(60)
    PartitionedMerge.write(target, path, keys, nBuckets)

    // source: update two existing keys, insert one new key
    val source = Seq(
      (7L, "attr7-CHANGED", 70L),
      (13L, "attr13-CHANGED", 131L),
      (999L, "attr999", 9990L)).toDF("k", "a", "b")
    val touchedExpected = source
      .select(PartitionedMerge.bucketExpr(keys, nBuckets).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet

    val before = fileState(path)

    val touched = PartitionedMerge.prunedMerge(
      spark, path, source, keys, nBuckets) { (pruned, src) =>
      MergeEngine.scd1(pruned, src, keys, tracked, "customer_skey",
        fixedNow, skeyBase = Some(PartitionedMerge.read(spark, path)))
    }
    assert(touched.toSet == touchedExpected)
    assert(touched.size < nBuckets, "test must leave some buckets untouched")

    // (a) result identical to the full-table merge program
    val expected = MergeEngine.scd1(target, source, keys, tracked,
      "customer_skey", fixedNow)
    val got = PartitionedMerge.read(spark, path)
    assert(rowsOf(got, "k") == rowsOf(expected, "k"))

    // (b) untouched bucket files: same paths, same mtimes
    val after = fileState(path)
    val untouchedBefore = before.filterNot { case (p, _) =>
      touched.exists(b => p.contains(s"${PartitionedMerge.BucketCol}=$b/")) }
    untouchedBefore.foreach { case (p, mtime) =>
      assert(after.get(p).contains(mtime), s"untouched file rewritten: $p")
    }
    // and touched buckets were rewritten
    assert(before.keys.exists(p =>
      touched.exists(b => p.contains(s"${PartitionedMerge.BucketCol}=$b/"))
        && !after.contains(p)))
  }

  test("pruned scan pushes the bucket predicate to partition level") {
    val path = tmpDir("pmerge2") + "/dim"
    PartitionedMerge.write(dim(60), path, keys, nBuckets)
    val pruned = spark.read.parquet(path)
      .filter(col(PartitionedMerge.BucketCol).isin(Int.box(0), Int.box(1)))
    pruned.count()
    // the bucket predicate must land in the scan's PartitionFilters (which
    // is what makes the FileIndex skip untouched directories), not remain
    // a post-scan data filter
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains(PartitionedMerge.BucketCol),
      s"bucket predicate not pushed to partition level: $scanLine")
  }

  test("second merge of the same bucket rotates .prev and stays correct") {
    import spark.implicits._
    val path = tmpDir("pmerge3") + "/dim"
    val target = dim(20)
    PartitionedMerge.write(target, path, keys, nBuckets)
    val s1 = Seq((3L, "v2", 31L)).toDF("k", "a", "b")
    val s2 = Seq((3L, "v3", 32L)).toDF("k", "a", "b")
    def run(src: DataFrame) =
      PartitionedMerge.prunedMerge(spark, path, src, keys, nBuckets) {
        (t, s) => MergeEngine.scd1(t, s, keys, tracked, "customer_skey",
          fixedNow, skeyBase = Some(PartitionedMerge.read(spark, path)))
      }
    run(s1); run(s2)
    val expected = MergeEngine.scd1(
      MergeEngine.scd1(target, s1, keys, tracked, "customer_skey", fixedNow),
      s2, keys, tracked, "customer_skey", fixedNow)
    assert(rowsOf(PartitionedMerge.read(spark, path), "k")
      == rowsOf(expected, "k"))
  }
}
