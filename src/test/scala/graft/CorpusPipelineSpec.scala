package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.pipeline.CorpusPipeline

/** The curation pipeline's invariants over the fixture corpus: gating,
  * exact + near-dup removal, stratified mix containment, packing bounds,
  * and versioned idempotent re-runs. */
class CorpusPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("bronze→silver→dedup→gold invariants hold; re-run is idempotent and versioned") {
    val cat = new Catalog(spark, tmpDir("graft-corpus"))
    val pipe = new CorpusPipeline(spark, cat)
    val raw = Tables.load(spark, sf0001, "documents")
    val gold = pipe.run(raw)

    val bronze = cat.read("bronze", "documents")
    assert(bronze.count() == raw.count())

    val silver = cat.read("silver", "documents")
    assert(silver.count() > 0 && silver.count() <= bronze.count())
    assert(silver.filter(col("quality") < 0.2).count() == 0)
    assert(silver.filter(col("lang_pred") === "und").count() == 0)

    val dedup = cat.read("silver", "documents_dedup")
    assert(dedup.count() > 0 && dedup.count() <= silver.count())
    // exact: one survivor per content hash
    assert(dedup.select("content_hash").distinct().count() == dedup.count())

    // gold ⊆ dedup; full-rate strata survive completely
    val goldIds = gold.select("doc_id")
    assert(goldIds.join(dedup.select("doc_id"), Seq("doc_id"), "left_anti")
      .count() == 0)
    for (l <- Seq("de", "fr", "es"))
      assert(gold.filter(col("lang") === l).count() ==
        dedup.filter(col("lang") === l).count(), s"full-rate stratum $l cut")

    // packing: within each (lang, batch) the tokens BEFORE each doc fit
    // the budget (a batch closes once the cumulative budget is crossed)
    val over = gold.withColumn("cum", sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter(col("batch_id") =!=
        floor((col("cum") - col("n_tokens")).cast("double") / 2048.0).cast("long"))
    assert(over.count() == 0, "batch assignment inconsistent with packing rule")

    // chunks: every deduped doc chunked, windows bounded, text is clean
    val chunks = cat.read("gold", "training_chunks")
    assert(chunks.select("doc_id").distinct().count() == dedup.count())
    assert(chunks.filter(col("n_chunk_tokens") > 64).count() == 0)
    assert(chunks.filter(col("n_chunk_tokens") <= 0).count() == 0)

    // re-run: same result, new version of every stage (collect run-1 rows
    // BEFORE the swap retires its files)
    val run1Rows = rowsOf(gold, "doc_id")
    val run1Count = gold.count()
    val gold2 = pipe.run(raw)
    assert(rowsOf(gold2, "doc_id") == run1Rows)
    assert(cat.currentVersion("gold", "training_batches") == 2)
    assert(cat.readVersion("gold", "training_batches", 1).count() == run1Count)
  }

  test("per-source cap bounds every domain, keeps a deterministic subset, mix still contained") {
    val cat = new Catalog(spark, tmpDir("graft-corpus-cap"))
    val raw = Tables.load(spark, sf0001, "documents")
    val uncapped = {
      val c = new Catalog(spark, tmpDir("graft-corpus-nocap"))
      new CorpusPipeline(spark, c).run(raw)
      c.read("silver", "documents_dedup")
    }
    val pipe = new CorpusPipeline(spark, cat, maxPerSource = Some(2L))
    val gold = pipe.run(raw)
    val capped = cat.read("silver", "documents_dedup")
    // the quota binds everywhere
    val perSource = capped.groupBy("source").count().collect()
    assert(perSource.nonEmpty && perSource.forall(_.getLong(1) <= 2),
      s"cap violated: ${perSource.mkString(",")}")
    // capped is a SUBSET of the uncapped survivors (the cap only removes)
    assert(capped.select("doc_id").join(uncapped.select("doc_id"),
      Seq("doc_id"), "left_anti").count() == 0)
    // downstream containment holds (checked BEFORE the re-run swaps the
    // snapshot these frames' file lists point at)
    assert(gold.select("doc_id").join(capped.select("doc_id"),
      Seq("doc_id"), "left_anti").count() == 0)
    // deterministic: a re-run keeps exactly the same documents
    val ids1 = rowsOf(capped.select("doc_id"), "doc_id")
    pipe.run(raw)
    assert(rowsOf(cat.read("silver", "documents_dedup").select("doc_id"),
      "doc_id") == ids1, "cap keep-set must be reproducible")
  }

  test("declarative graph run matches the imperative pipeline table for table") {
    val raw = Tables.load(spark, sf0001, "documents")
    val impCat = new Catalog(spark, tmpDir("graft-corpus-imp"))
    new CorpusPipeline(spark, impCat).run(raw)
    val decCat = new Catalog(spark, tmpDir("graft-corpus-dec"))
    val res = new CorpusPipeline(spark, decCat).runDeclarative(raw)
    assert(res.order == Seq("bronze.documents", "silver.documents",
      "silver.documents_dedup", "gold.training_chunks",
      "gold.training_batches"))
    for (table <- Seq("bronze/documents", "silver/documents",
        "silver/documents_dedup", "gold/training_chunks",
        "gold/training_batches")) {
      val Array(layer, name) = table.split('/')
      val a = impCat.read(layer, name)
      val cols = a.columns.toSeq.sorted
      val b = decCat.read(layer, name)
      assert(rowsOf(a.select(cols.map(col): _*), cols: _*) ==
        rowsOf(b.select(cols.map(col): _*), cols: _*),
        s"declarative $table diverged from the imperative run")
    }
    // the gate ran as expectations: per-rule drop counts were reported
    val gateCounts = res.violations("silver.documents")
    assert(gateCounts.keySet == Set("min_quality", "lang_known"))
    val bronzeN = decCat.read("bronze", "documents").count()
    val silverN = decCat.read("silver", "documents").count()
    assert(silverN < bronzeN && gateCounts.values.sum >= bronzeN - silverN)
  }
}
