package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.functions.TextFunctions._
import graft.operators.{Dedup, TextQueries}

/** End-to-end training-corpus curation over the medallion catalog — the
  * LLM-data counterpart of [[Medallion]] (the engine's north star
  * workload): each stage is a versioned snapshot table, so a re-run
  * rolls the whole corpus forward atomically and every previous state
  * stays time-travelable.
  *
  *   - `bronze.documents`     — raw corpus (what `Streams.appendNewDocs`
  *                              lands incrementally);
  *   - `silver.documents`     — annotated (quality, lang-ID, token count,
  *                              content hash) and gated on quality/lang;
  *   - `silver.documents_dedup` — exact-dup survivors (lowest id per
  *                              content hash) minus near-dup cluster
  *                              non-representatives (shingle-Jaccard →
  *                              connected components);
  *   - `gold.training_batches` — hash-stratified language mix, token-packed
  *                              into fixed-budget batches.
  *
  * Scale posture: every stage is one declarative plan over the previous
  * snapshot — annotations are codegen'd Column expressions; exact dedup is
  * a key window (one shuffle on the content hash); near-dup is the banded
  * inverted-index join + checkpointed label propagation from [[Dedup]];
  * the mix is the engine-independent hash sampler; packing is one window
  * per language partition. No driver-side data paths anywhere.
  */
class CorpusPipeline(spark: SparkSession, cat: Catalog,
    minQuality: Double = 0.2,
    sampleRates: Map[String, Double] = Map(
      "en" -> 0.5, "de" -> 1.0, "fr" -> 1.0, "es" -> 1.0, "zh" -> 1.0),
    tokensPerBatch: Long = 2048L,
    maxPerSource: Option[Long] = None) {

  /** Silver annotation starts from CANONICAL text: NFC + control/space
    * cleanup, then PII redaction (q82/q76 passes) — normalization must
    * run BEFORE hashing or byte-variant duplicates (composed vs
    * decomposed accents, whitespace runs) defeat every dedup stage
    * downstream. The raw text column is preserved; all signals, hashes,
    * shingles and chunks read `text_clean`. */
  private def annotate(raw: DataFrame): DataFrame = raw
    .withColumn("text_clean",
      TextQueries.redactPii(
        graft.functions.TextNormalize.cleanText(col("text"))))
    .withColumn("quality", qualityScore(col("text_clean")))
    .withColumn("lang_pred", langId(col("text_clean")))
    .withColumn("n_tokens", tokenCountWs(col("text_clean")))
    .withColumn("content_hash", md5(col("text_clean")))

  private val gateRules = Map(
    "min_quality" -> s"quality >= $minQuality",
    "lang_known" -> "lang_pred <> 'und'")

  private def dedupStage(silver: DataFrame): DataFrame = {
    val exactSurvivors = silver
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
    val keepers = Dedup.dedupClustersOf(exactSurvivors)
      .filter(col("is_kept") === 1).select("doc_id")
    capStage(exactSurvivors.join(keepers, Seq("doc_id"), "left_semi"))
  }

  /** Optional per-source quota (q125's operator inside the pipeline): no
    * single domain may dominate the curated corpus. Runs AFTER dedup —
    * the cap should spend its budget on unique documents — and before the
    * mix, so sampling rates see the capped composition. Deterministic
    * keep-order (hash of the id), so re-runs and engine changes keep the
    * same documents. WindowGroupLimit pushes the quota below the shuffle. */
  private def capStage(deduped: DataFrame): DataFrame = maxPerSource match {
    case None => deduped
    case Some(k) =>
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      deduped.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k).drop("__rk")
  }

  /** Context-window chunks of the curated corpus (q79's operator over the
    * deduped snapshot): what a trainer actually consumes. */
  private def chunkStage(deduped: DataFrame): DataFrame =
    TextQueries.chunkOf(
      deduped.select(col("doc_id"), col("text_clean").as("text")),
      window = 64, stride = 48)
      .join(deduped.select("doc_id", "lang"), Seq("doc_id"))

  private def packStage(deduped: DataFrame): DataFrame = {
    val mixed = TextQueries.hashStratifiedSample(
      deduped, "lang", "doc_id", sampleRates)
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    mixed
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("batch_id", floor(
        (col("cum_tokens") - col("n_tokens")).cast("double") / tokensPerBatch)
        .cast("long"))
      .select("doc_id", "lang", "quality", "n_tokens", "batch_id")
  }

  def run(raw: DataFrame): DataFrame = {
    cat.overwriteSnapshot(raw, "bronze", "documents")
    val gated = annotate(cat.read("bronze", "documents"))
      .filter(col("quality") >= minQuality && col("lang_pred") =!= "und")
    cat.overwriteSnapshot(gated, "silver", "documents")
    cat.overwriteSnapshot(dedupStage(cat.read("silver", "documents")),
      "silver", "documents_dedup")
    cat.overwriteSnapshot(chunkStage(cat.read("silver", "documents_dedup")),
      "gold", "training_chunks")
    cat.overwriteSnapshot(packStage(cat.read("silver", "documents_dedup")),
      "gold", "training_batches")
    cat.read("gold", "training_batches")
  }

  /** The same curation chain declared DLT-style: the quality/language gate
    * becomes the node's EXPECTATIONS (expect_all_or_drop — identical rows
    * kept, violation counts reported), dependencies drive the order. */
  def declarativeGraph(): PipelineGraph =
    new PipelineGraph(spark, cat)
      .table("bronze.documents", inputs = Seq("raw"))(r => r("raw"))
      .table("silver.documents", inputs = Seq("bronze.documents"),
        expectations = gateRules)(
        r => annotate(r("bronze.documents")))
      .table("silver.documents_dedup", inputs = Seq("silver.documents"))(
        r => dedupStage(r("silver.documents")))
      .table("gold.training_chunks", inputs = Seq("silver.documents_dedup"))(
        r => chunkStage(r("silver.documents_dedup")))
      .table("gold.training_batches", inputs = Seq("silver.documents_dedup"))(
        r => packStage(r("silver.documents_dedup")))

  /** [[run]] through the declarative graph. */
  def runDeclarative(raw: DataFrame): PipelineGraph.RunResult =
    declarativeGraph().run(Map("raw" -> raw))
}
