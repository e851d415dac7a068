package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.layout.{DeletionVectors, ReadProbeCache}
import graft.merge.PartitionedMerge

/** The per-version read-probe cache (round 8): correctness of the
  * invalidation contract, not just the happy path. The cache's claim is
  * that a (path, pointer-version) key can never serve a stale DV/layout
  * answer because every sidecar or layout mutation advances the pointer
  * — these cases exercise the claim across the mutations that matter. */
class ReadProbeCacheSpec extends SparkSuite {
  import spark.implicits._

  test("a DV-creating DELETE is visible to the very next read (flat)") {
    val dir = tmpDir("probe-flat") + "/t"
    val cat = new Catalog(spark, tmpDir("probe-flat-wh"))
    spark.range(10L).toDF("id").withColumn("v", col("id") * 2)
      .write.parquet(dir)
    // populate the cache at the pre-DV version
    assert(ReadProbeCache.probe(spark, dir).dvDirs.isEmpty)
    assert(rowsOf(DeletionVectors.readPath(spark, dir), "id").size == 10)
    DeletionVectors.enable(spark, dir)
    val n = DeletionVectors.deleteWhere(spark, dir, col("id") < 3)
    assert(n == 3)
    // the commit advanced the pointer AND invalidated in-JVM — the probe
    // must see the sidecar and the read must apply it immediately
    assert(ReadProbeCache.probe(spark, dir).dvDirs.nonEmpty)
    assert(rowsOf(DeletionVectors.readPath(spark, dir), "id")
      .map(_.head) == (3L to 9L))
  }

  test("bucketed DV DML flips the probe; OPTIMIZE folds it back") {
    val dir = tmpDir("probe-bkt") + "/t"
    PartitionedMerge.write(
      (1L to 40L).toDF("k").withColumn("v", col("k") * 10),
      dir, Seq("k"), 4)
    val pr0 = ReadProbeCache.probe(spark, dir)
    assert(pr0.isBucketed && pr0.dvDirs.isEmpty)
    graft.layout.BucketedDml.deleteWhereMor(spark, dir, col("k") <= 5)
    val pr1 = ReadProbeCache.probe(spark, dir)
    assert(pr1.dvDirs.nonEmpty, "merge-on-read delete must surface a " +
      "per-bucket _dv sidecar through the cached probe")
    assert(PartitionedMerge.read(spark, dir).count() == 35)
    // materialize folds the sidecars into rewritten buckets (new version)
    graft.layout.BucketedDml.materialize(spark, dir)
    assert(ReadProbeCache.probe(spark, dir).dvDirs.isEmpty)
    assert(PartitionedMerge.read(spark, dir).count() == 35)
  }

  test("cross-process writers are caught by the version key alone") {
    val dir = tmpDir("probe-xproc") + "/t"
    spark.range(10L).toDF("id").write.parquet(dir)
    assert(ReadProbeCache.probe(spark, dir).dvDirs.isEmpty)
    // simulate another process: plant the sidecar and advance the pointer
    // WITHOUT this JVM's invalidation hooks (raw FS writes)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(("part-00000-fake.parquet", 0L)).toDF("file_name", "row_index")
      .write.parquet(s"$dir/${DeletionVectors.DvDirName}")
    // re-prime the stale answer for the CURRENT version, then move the
    // pointer the way a foreign commit would
    ReadProbeCache.invalidate(dir)
    val vBefore = Catalog.readPointer(fs, dir)
    fs.mkdirs(Catalog.historyDir(dir))
    val out = fs.create(new org.apache.hadoop.fs.Path(
      Catalog.historyDir(dir), "_current"), true)
    try out.write(String.valueOf(vBefore + 1).getBytes("UTF-8"))
    finally out.close()
    val pr = ReadProbeCache.probe(spark, dir)
    assert(pr.dvDirs.nonEmpty,
      "a foreign commit (pointer moved by another process) must re-probe")
  }
}
