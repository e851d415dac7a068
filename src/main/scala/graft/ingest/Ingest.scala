package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructType}

/** Bronze-layer incremental ingest (SURVEY.md §2.1 S1/S2, §2.9 T1-T4):
  * the vanilla-Spark replacement for Databricks Auto Loader
  * (Bronze_Layer.py:20-37).
  *
  * Semantics preserved: incremental file discovery (only files unseen by
  * the checkpoint are processed), exactly-once append via checkpointed
  * file-sink commit log, run-once drain trigger (`Trigger.AvailableNow`,
  * Spark 4's successor to `trigger(once=True)`), schema pinned at first run
  * (persisted next to the checkpoint, like `cloudFiles.schemaLocation`),
  * and a nullable `_rescued_data` column for schema-compat with the
  * reference's Silver layer, which drops it (Silver_Customers.py:18).
  *
  * Scale posture: file listing is driver-side but incremental (the
  * checkpoint's file log bounds re-listing); `maxFilesPerTrigger` caps
  * per-batch work so a backlogged source cannot produce an unboundedly
  * large micro-batch.
  */
object Ingest {

  final case class IngestSpec(name: String, srcDir: String, dstDir: String,
      checkpointDir: String, schemaFile: String)

  /** Infer-once-and-pin schema, like Auto Loader's schemaLocation
    * (Bronze_Layer.py:22). */
  def pinnedSchema(spark: SparkSession, spec: IngestSpec): StructType = {
    val p = new java.io.File(spec.schemaFile)
    if (p.exists()) {
      StructType.fromDDL(new String(
        java.nio.file.Files.readAllBytes(p.toPath), "UTF-8"))
    } else {
      val s = spark.read.parquet(spec.srcDir).schema
      p.getParentFile.mkdirs()
      java.nio.file.Files.write(p.toPath, s.toDDL.getBytes("UTF-8"))
      s
    }
  }

  /** One checkpointed drain of available files into the bronze layer
    * (Bronze_Layer.py:20-37). Returns rows appended this run. */
  def runOnce(spark: SparkSession, spec: IngestSpec,
      maxFilesPerTrigger: Int = 1000): Long = {
    val schema = pinnedSchema(spark, spec)
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(spec.srcDir)
      .withColumn("_rescued_data", lit(null).cast(StringType))
    val before = countIfExists(spark, spec.dstDir)
    val q = stream.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", spec.dstDir)
      .option("checkpointLocation", spec.checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    countIfExists(spark, spec.dstDir) - before
  }

  /** Job fan-out over dataset specs (parameters.py:2-19's task-value loop,
    * as a plain Scala sequence). */
  def runAll(spark: SparkSession, specs: Seq[IngestSpec]): Map[String, Long] =
    specs.map(s => s.name -> runOnce(spark, s)).toMap

  private def countIfExists(spark: SparkSession, dir: String): Long =
    try spark.read.parquet(dir).count() catch { case _: Throwable => 0L }

  def readBronze(spark: SparkSession, dstDir: String): DataFrame =
    spark.read.parquet(dstDir)
}
