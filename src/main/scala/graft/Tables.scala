package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * All queries in the engine take a scale-factor directory and read these
  * tables; the physical layout is one parquet file/dir per table. At cluster
  * scale these would be partitioned datasets — the reader path is identical
  * (`spark.read.parquet` handles multi-file dirs and partition discovery).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which vanilla Spark only
    * reads via `spark.sql.legacy.parquet.nanosAsLong` (set in every session
    * builder here). The fixture's nanos are micro-aligned, so the
    * long→timestamp_micros conversion is lossless. */
  /** Scale-adaptive shuffle width for a frame whose ROW COUNT is known
    * (guide §2 "make partitioning scale-adaptive — derive from input
    * size rather than a constant tuned for local mode or the cluster"):
    * `ceil(rows / rowsPerPartition)` clamped to [1, maxPartitions].
    * Explicit `repartition(n, key)` exchanges are invisible to AQE's
    * coalescing, so a fixed `repartition(defaultParallelism, …)` pays
    * 32-wide task overhead on a 5k-row fixture AND caps a 100 TB run at
    * core count; deriving n from the data sizes both ends correctly.
    *
    * The floor only governs the SMALL end (don't fan tiny frames wide);
    * past `rows ≈ 64Ki × cores` the `maxPartitions` cap — default
    * defaultParallelism, i.e. sized by the CLUSTER — takes over, which
    * for an iterative fold (one pass per round) is the point of maximum
    * real parallelism; wider only trades task overhead for nothing
    * (measured r15: 8× defaultParallelism put the text CC fold's ~7 M
    * edge rows on 107-wide rounds and cost ~1.5 s/query vs 32). 64 Ki
    * slim rows amortize a task's fixed overhead thousands of times over
    * while still splitting any frame whose per-partition JOIN work is
    * real (measured r15: 1 Mi rows/partition serialized those same CC
    * rounds onto 2 tasks and doubled q57). Production tunes per
    * deployment via `graft.shuffle.rowsPerPartition` /
    * `graft.shuffle.maxPartitions` (e.g. raise the cap when per-round
    * per-task state must shrink below memory). */
  def sizedPartitions(spark: SparkSession, rows: Long): Int = {
    val per = math.max(1L, spark.conf
      .get("graft.shuffle.rowsPerPartition", (1L << 16).toString).toLong)
    val maxP = math.max(1, spark.conf.get("graft.shuffle.maxPartitions",
      spark.sparkContext.defaultParallelism.toString).toInt)
    math.max(1L, math.min(maxP.toLong, (rows + per - 1) / per)).toInt
  }

  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
}
