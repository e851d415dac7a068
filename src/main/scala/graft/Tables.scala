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
