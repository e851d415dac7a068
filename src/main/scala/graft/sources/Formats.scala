package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cross-format source/sink fidelity (the reference's bronze layer is
  * format-agnostic ingestion — Bronze_Layer.py reads whatever lands; this
  * module proves the engine's OTHER columnar/row formats round-trip
  * losslessly, not just parquet).
  *
  * The round-trip query writes the documents table through the format
  * under test and reads it back; the DuckDB oracle reads the ORIGINAL
  * parquet — so any sink- or source-side corruption (encoding, nullness,
  * type narrowing, row loss) breaks the hash compare. ORC is the
  * oracle-checked path (columnar, zero-config lossless); CSV and JSON are
  * spec-checked via [[roundTrip]] (their quoting/escaping options are the
  * fidelity risk, which FormatsSpec pins on adversarial strings parquet
  * fixtures can't carry).
  *
  * At 100 TB the write is a distributed per-partition sink and the
  * read-back scans in parallel — nothing here is driver-sized; the temp
  * path would be an object-store prefix on a cluster.
  */
object Formats {

  /** Write `df` through `format` into a fresh temp dir, read it back.
    * CSV needs the header to rebuild column names and multiLine+escape to
    * survive embedded newlines/quotes; the read schema is pinned to the
    * input's DDL so CSV's stringly types round-trip as the original ones. */
  def roundTrip(df: DataFrame, format: String): DataFrame = {
    val spark = df.sparkSession
    val path = java.nio.file.Files
      .createTempDirectory(s"graft-fmt-$format").resolve("t").toString
    val w = df.write.mode("overwrite")
    format match {
      case "csv" =>
        w.option("header", "true").option("escape", "\"").csv(path)
        spark.read.schema(df.schema).option("header", "true")
          .option("multiLine", "true").option("escape", "\"").csv(path)
      case "json" =>
        w.json(path)
        spark.read.schema(df.schema).json(path)
      case "orc" =>
        w.orc(path)
        spark.read.orc(path)
      case other => throw new IllegalArgumentException(s"format: $other")
    }
  }

  /** ORC round trip of the full documents table, every column carried:
    * the oracle reads the original parquet, so the hash compare certifies
    * the ORC sink + source end to end. */
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame =
    roundTrip(Tables.load(spark, dir, "documents"), "orc")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .orderBy("doc_id")

  /** COPY INTO driven end to end and hash-compared: two statements land
    * the documents fixture in a fresh table (the second is the idempotent
    * no-op), and the oracle reads the original parquet — loader row loss,
    * duplication, or type drift all break the compare. */
  def copyIntoRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val dst = java.nio.file.Files.createTempDirectory("graft-q83")
      .resolve("t").toString
    val src = s"$dir/documents.parquet"
    graft.ingest.CopyInto.run(spark, dst, src, "parquet")
    val replay = graft.ingest.CopyInto.run(spark, dst, src, "parquet")
    require(replay.filesLoaded == 0L,
      s"COPY INTO replay was not a no-op: $replay")
    spark.read.parquet(dst)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_orc_roundtrip" -> (orcRoundTrip _),
    "q83_copy_into"     -> (copyIntoRoundTrip _))

  val oracles: Map[String, String] = Map(
    // the oracle never touches ORC: identity over the source parquet
    "q80_orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents ORDER BY doc_id""",
    // identity again: a duplicated or dropped row under COPY INTO's
    // two-statement run breaks the hash
    "q83_copy_into" ->
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents ORDER BY doc_id""")
}
