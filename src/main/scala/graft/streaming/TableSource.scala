package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftShims, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.catalog.{Catalog, ChangeFeed}

/** Streaming SOURCE over a graft-versioned table — Delta's
  * `spark.readStream.format("delta")` parity (the reference platform
  * streams FROM its managed tables, not just into them; without this,
  * downstream pipelines must poll [[graft.catalog.ChangeFeed.consumeChanges]]
  * by hand).
  *
  * ```
  * spark.readStream.format("graft-table")
  *   .option("path", dir)          // table directory
  *   .option("feed", "rows"|"cdc") // default rows
  *   .option("keys", "id")         // cdc: keyed diff (pre/postimages)
  *   .load()
  * ```
  *
  * Offsets ARE committed versions (one long — the version log is the
  * write-ahead log a streaming source wants): `getOffset` reads the
  * table's pointer, batch (fromV, toV] materializes through the same
  * version-addressed reads every other consumer uses. The FIRST batch is
  * the full live snapshot as inserts (Delta's initial-snapshot rule), so
  * a new stream starts complete instead of empty.
  *
  * - `feed=rows` (default): appended ROWS only — each batch emits the
  *   range's insert-typed change rows, which on the append-only tables
  *   this mode is for IS exactly the new data (Delta's default
  *   readStream likewise assumes append-only; pipelines that must see
  *   updates/deletes use cdc mode).
  * - `feed=cdc`: the full change feed with [[ChangeFeed.ChangeCol]]
  *   (insert / delete / update_preimage / update_postimage), keyed when
  *   `keys` is set — `table_changes` as an unbounded stream.
  *
  * Exactly-once: the engine checkpoints the version offsets; a replayed
  * batch recomputes the SAME (fromV, toV] diff — deterministic while
  * both versions are retained, which `keepVersions` must cover for the
  * maximum expected downtime (the Delta retention-vs-streaming contract;
  * an aged-out version fails loudly rather than skipping). Deletion
  * vectors compose: version reads are DV-applied, so a DV delete commit
  * emits its rows as `delete` changes in cdc mode.
  *
  * Scale: `getOffset` is one driver-side pointer read per trigger; a
  * batch moves only the diff (bucket-pruned on bucketed tables, new
  * files only on the append fast path) — stream cost is O(changes),
  * never O(table). */
class GraftTableSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-table source requires .option(\"path\", <table dir>)"))

  private def baseSchema(sqlContext: SQLContext, dir: String): StructType =
    sqlContext.sparkSession.read.parquet(dir).schema

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val dir = dirOf(parameters)
    val base = schema.getOrElse(baseSchema(sqlContext, dir))
    val out =
      if (parameters.getOrElse("feed", "rows") == "cdc")
        StructType(base.fields :+
          StructField(ChangeFeed.ChangeCol, StringType, nullable = false))
      else base
    (shortName(), out)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val dir = dirOf(parameters)
    new GraftTableSource(sqlContext, dir,
      cdc = parameters.getOrElse("feed", "rows") == "cdc",
      keys = parameters.get("keys").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      dataSchema = schema.getOrElse(baseSchema(sqlContext, dir)))
  }
}

class GraftTableSource(sqlContext: SQLContext, dir: String,
    cdc: Boolean, keys: Seq[String], dataSchema: StructType)
    extends Source {

  private val spark = sqlContext.sparkSession
  private def fs = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override val schema: StructType =
    if (cdc) StructType(dataSchema.fields :+
      StructField(ChangeFeed.ChangeCol, StringType, nullable = false))
    else dataSchema

  override def getOffset: Option[Offset] = {
    val v = Catalog.readPointer(fs, dir)
    if (v < 1) None else Some(LongOffset(v.toLong))
  }

  // every offset this source ever emits is a LongOffset; a checkpoint
  // recovery hands back SerializedOffset carrying the same json (the
  // bare number), so json-parsing covers both without class matching
  private def versionOf(o: Offset): Int = o.json.trim.toLong.toInt

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val toV = versionOf(end)
    val batch = start.map(versionOf) match {
      case None =>
        // initial batch: the full snapshot at `toV`, typed as inserts
        graft.layout.DeletionVectors.readPath(spark,
          Catalog.resolveVersionPath(spark, dir, toV))
          .withColumn(ChangeFeed.ChangeCol, lit("insert"))
      case Some(fromV) if fromV >= toV =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(dataSchema.fields :+ StructField(
            ChangeFeed.ChangeCol, StringType, nullable = false)))
      case Some(fromV) =>
        ChangeFeed.tableChanges(spark, dir, fromV, toV, keys)
    }
    val shaped =
      if (cdc) batch.select(schema.fieldNames.map(col).toSeq: _*)
      else batch.filter(col(ChangeFeed.ChangeCol) === "insert")
        .select(dataSchema.fieldNames.map(col).toSeq: _*)
    GraftShims.streamingFrame(sqlContext, shaped)
  }

  override def stop(): Unit = ()
}
