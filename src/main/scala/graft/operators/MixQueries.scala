package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.TextQueries.{grams3Sql, wordsSql, qualitySql}

/** Mixture design and budget allocation over the `documents` table — the
  * data-mixing decision layer of an LLM corpus pipeline: upsampling
  * weights, temperature/UniMax reweighting, DoReMi-style iterative
  * rebalance, water-filling under per-source token budgets, exact
  * proportional eval quotas, drift monitoring, the curation funnel
  * audit, and rendezvous resharding. Split out of TextQueries along the
  * seam VERDICT r10 #8 named — same queries, same oracles, no behavior
  * change.
  *
  * Scale posture shared by the family: per-language/per-source hash
  * aggregates (map-side combined, bounded by #langs × #sources, never
  * corpus-scaled); any driver-side fold is over that bounded table; the
  * per-document reweight/assignment passes are one codegen'd projection
  * joined against a BROADCAST of the bounded weight table. */
object MixQueries {

  /** Weighted mixture upsampling (the other half of data mixing — q58
    * downsamples, this REPLICATES: weight 2.5 means every doc twice plus a
    * deterministic half keep a third copy). The fractional part is the
    * same md5 membership function as q58, so replication is a pure
    * function of doc_id — identical across runs, engines and cluster
    * sizes, and the oracle replays it exactly. explode(sequence(...))
    * keeps the fan-out distributed and codegen'd. */
  def mixUpsample(spark: SparkSession, dir: String): DataFrame = {
    val weights = Seq("en" -> 0.3, "de" -> 2.5, "fr" -> 1.0,
      "es" -> 2.0, "zh" -> 0.7)
    val h = substring(
      md5(concat(col("doc_id").cast("string"), lit("#mix42"))), 1, 4)
    val nCopies = weights.foldLeft(lit(0)) { case (acc, (lang, w)) =>
      val base = math.floor(w).toInt
      val thresh = f"${math.floor((w - base) * 65536).toInt}%04x"
      when(col("lang") === lang,
        lit(base) + (h < lit(thresh)).cast("int")).otherwise(acc)
    }
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), nCopies.as("n_copies"))
      .filter(col("n_copies") > 0)
      .withColumn("copy_no", explode(sequence(lit(1), col("n_copies"))))
      .select("doc_id", "lang", "copy_no")
      .orderBy("doc_id", "copy_no")
  }

  /** Corpus-composition drift monitor: the language mix of an earlier
    * corpus state (the deterministic 3/4 subset `doc_id % 4 != 0`, the
    * oracle-replayable stand-in for `VERSION AS OF` yesterday) against the
    * full corpus today. Per-language document shares as exact
    * parts-per-million (scaled-BIGINT — no double accumulation), their
    * delta, and a drift flag at 1% — the gate a production pipeline alarms
    * on before a skewed crawl batch poisons the training mix. Two
    * two-phase aggregations plus a tiny per-language join. */
  def corpusDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    def mix(df: DataFrame, share: String): DataFrame = {
      val n = df.count() // two driver-side scalars, not a data path
      df.groupBy("lang").agg(count(lit(1)).as("__c"))
        .select(col("lang"), // DIV: integer division, = DuckDB's //
          expr(s"__c * 1000000 DIV ${n}L").as(share))
    }
    mix(docs.filter(col("doc_id") % 4 =!= 0), "ppm_before")
      .join(mix(docs, "ppm_after"), Seq("lang"), "full_outer")
      .select(col("lang"),
        coalesce(col("ppm_before"), lit(0L)).as("ppm_before"),
        coalesce(col("ppm_after"), lit(0L)).as("ppm_after"))
      .withColumn("delta_ppm", col("ppm_after") - col("ppm_before"))
      .withColumn("drifted", (abs(col("delta_ppm")) > 10000L).cast("int"))
      .orderBy("lang")
  }

  /** Temperature-based multilingual mixture reweighting — the mT5/XLM-R
    * alpha-sampling recipe (Xue et al. 2021 §3.1; Conneau et al. 2020):
    * sample language l with probability ∝ p_l^α so low-resource languages
    * are upsampled relative to their corpus share. α = 0.5 here, which
    * makes the adjusted weight √c_l — computable EXACTLY as an integer
    * square root (`floor(sqrt(c_l · 1e6))`: both engines' sqrt is IEEE
    * correctly rounded, and the floor can't straddle an integer until
    * counts approach 2^50), so the whole pipeline stays in BIGINT and
    * hash-compares. Per-language replication factor
    * `(1e6 · w_l · N) DIV (S · c_l)` (S = Σ w_l — an order-free integer
    * sum, unlike a double Σ√); per-doc copies = whole part + one
    * fractional copy gated on the doc's 16-bit md5 slot vs the hex-string
    * threshold (the q58/q77 determinism pattern). This computes the
    * weights q77's generic upsampler takes as INPUT.
    *
    * Scale: one two-phase lang count (≤ languages rows), a single-row
    * totals frame, both broadcast; then one codegen'd map pass over the
    * corpus. Nothing shuffles the data. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("c_lang"))
      .withColumn("w",
        floor(sqrt((col("c_lang") * 1000000L).cast("double"))).cast("long"))
    val totals = counts.agg(sum("c_lang").as("n_total"), sum("w").as("s_w"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col("lang"), col("c_lang"),
        expr("(1000000 * w * n_total) DIV (s_w * c_lang)").as("factor_ppm"))
    docs.join(broadcast(rates), Seq("lang"))
      .withColumn("slot", substring(
        md5(concat(col("doc_id").cast("string"), lit("#temp42"))), 1, 4))
      .withColumn("n_copies",
        expr("factor_ppm DIV 1000000") +
          when(col("slot") < format_string("%04x",
            expr("(factor_ppm % 1000000) * 65536 DIV 1000000")
              .cast("int")), 1L).otherwise(0L))
      .select("doc_id", "lang", "c_lang", "factor_ppm", "n_copies")
      .orderBy("doc_id")
  }

  /** UniMax budget-constrained mixture allocation (Chung et al. 2022):
    * languages are processed smallest-first; each receives
    * min(epochCap · its tokens, remaining budget ÷ remaining languages)
    * — small languages get their full capped allocation, the leftover
    * spreads evenly over the large ones, and no language exceeds
    * `epochCap` epochs (the repetition bound temperature sampling
    * (q147) lacks). Budget = 60% of corpus tokens here; all integer
    * DIV, so the oracle's recursive CTE reproduces the fold exactly.
    *
    * Scale shape: the distributed work is ONE bounded hash-agg (per-lang
    * token sums); the sequential fold runs driver-side over ≤#languages
    * rows (the k-means-centroid boundedness argument — language counts
    * are dozens, never data-scale) and the result IS those rows. */
  def unimaxMix(spark: SparkSession, dir: String, epochCap: Long = 3L)
      : DataFrame = {
    import spark.implicits._
    val sizes = Tables.load(spark, dir, "documents")
      .groupBy("lang").agg(sum(tokenCountWs(col("text"))).as("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (lang, n) => (n, lang) }
    val total = sizes.map(_._2).sum
    var rem = total * 6 / 10
    val out = sizes.zipWithIndex.map { case ((lang, n), i) =>
      val alloc = math.min(epochCap * n, rem / (sizes.length - i))
      rem -= alloc
      (lang, n, alloc, alloc * 1000000L / n)
    }
    out.toSeq.toDF("lang", "n_tokens", "budget", "epochs_ppm")
      .orderBy("lang")
  }

  /** q206: iterative domain reweighting — the DoReMi-flavored loop
    * (Xie et al. 2023's multiplicative-weights shape) that the static
    * mixture tools (temperature q147, UniMax q172, caps q125) cannot
    * express: each round moves every domain's weight a damped,
    * difficulty-scaled step toward the target share, where the step
    * interacts with the CURRENT mixture through the normalization — a
    * genuine fixed-point iteration, not a closed form. Weights start at
    * the empirical shares; "difficulty" is a bounded per-domain
    * multiplier derived from mean document length (the stand-in for the
    * per-domain excess-loss signal a reference model supplies in
    * production). All integer ppb arithmetic, so the unrolled DuckDB
    * oracle matches bit for bit; the w·d·(t−share) product peaks at
    * ~7e18 < Long.MaxValue (no overflow on either engine).
    *
    * Scale shape: the corpus is touched ONCE (the groupBy); every round
    * moves O(domains) rows against a broadcast single-row sum — the BT
    * MM-loop posture (q179) applied to mixture design. */
  def mixtureRebalance(spark: SparkSession, dir: String, rounds: Int = 3)
      : DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("c"),
        expr("sum(n_chars) DIV count(1)").as("mean_chars"))
    val tot = base.agg(sum(col("c")).as("n_total"),
      count(lit(1)).as("n_dom"))
    var w = base.crossJoin(broadcast(tot))
      .select(col("source"), col("c"), col("mean_chars"),
        expr("1000000000 * c DIV n_total").as("w"),
        expr("1000000000 DIV n_dom").as("t"),
        (lit(1L) + pmod(col("mean_chars"), lit(7L))).as("d"))
    for (_ <- 1 to rounds) {
      val s = w.agg(sum(col("w")).as("s_w"))
      w = w.crossJoin(broadcast(s))
        .withColumn("w",
          expr("w + (w * d * (t - (1000000000 * w DIV s_w))) " +
            "DIV 8000000000"))
        .drop("s_w")
    }
    val sF = w.agg(sum(col("w")).as("s_w"))
    w.crossJoin(broadcast(sF))
      .select(col("source"), col("c").as("n_docs"), col("mean_chars"),
        col("d").as("step_mult"), col("w").as("weight_raw"),
        expr("1000000000 * w DIV s_w").as("share_ppb"))
      .orderBy("source")
  }

  /** q208: data-constrained token budgeting — the water-filling
    * allocation behind repetition-capped training plans (the public
    * "data-constrained scaling" rule: repeating a domain beyond ~4
    * epochs stops paying). A global budget of 2× the corpus's token
    * supply is split across domains: each round every UNSATURATED
    * domain receives an equal share of the remaining budget, clipped at
    * its 4-epoch cap; saturated domains drop out and their slack
    * redistributes to the rest — exactly the fixed point "small domains
    * repeat to their cap, large domains absorb what's left" that a
    * closed-form split gets wrong. Token supply is the n_chars DIV 4
    * proxy; all arithmetic is exact BIGINT so the unrolled DuckDB
    * oracle matches bit for bit.
    *
    * Scale shape: one corpus scan (the groupBy); each round is
    * O(domains) rows against a broadcast single-row (remaining,
    * n_active) aggregate — the q206/q179 iterative posture. */
  def budgetWaterfill(spark: SparkSession, dir: String, rounds: Int = 3)
      : DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .groupBy("source")
      .agg(expr("sum(n_chars DIV 4)").as("supply"))
    var st = base
      .select(col("source"), col("supply"), (col("supply") * 4).as("cap"),
        lit(0L).as("alloc"))
    for (_ <- 1 to rounds) {
      val totals = st.agg(
        (sum(col("supply")) * 2 - sum(col("alloc"))).as("remaining"),
        sum(when(col("alloc") < col("cap"), 1L).otherwise(0L))
          .as("n_active"))
      st = st.crossJoin(broadcast(totals))
        .withColumn("alloc",
          col("alloc") + when(col("alloc") < col("cap"),
            least(col("cap") - col("alloc"),
              expr("remaining DIV greatest(1, n_active)"))).otherwise(0L))
        .drop("remaining", "n_active")
    }
    st.select(col("source"), col("supply"), col("cap"), col("alloc"),
      expr("1000000 * alloc DIV greatest(1, supply)").as("epochs_ppm"),
      (col("alloc") >= col("cap")).cast("int").as("saturated"))
      .orderBy("source")
  }

  /** q215: exact proportional eval-split allocation by the largest-
    * remainder (Hare quota) method — the "make the held-out set
    * representative" step: given an eval budget of exactly ⌊N/denom⌋
    * documents, each language cell gets ⌊E·n_cell/N⌋ seats plus at most
    * one of the leftover seats, awarded by largest fractional remainder
    * (lang ascending on ties). Unlike q58's per-cell FRACTION sampling,
    * the total here is EXACT — Σ alloc = E always, the invariant an
    * eval-harness contract actually needs.
    *
    * Scale shape: one groupBy(lang) count (map-side combined), then all
    * arithmetic on O(languages) rows — the single-partition remainder
    * window is over cells, not data (the q172 UniMax precedent). */
  def quotaSplit(spark: SparkSession, dir: String, denom: Int = 10)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.load(spark, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val tot = cells.agg(sum(col("n_docs")).as("n_total"))
    val based = cells.crossJoin(broadcast(tot))
      .withColumn("e_total", expr(s"n_total DIV $denom"))
      .withColumn("base", expr("e_total * n_docs DIV n_total"))
      .withColumn("rem", expr("(e_total * n_docs) % n_total"))
    val spare = based.agg(
      (first(col("e_total")) - sum(col("base"))).as("r_slots"))
    based.crossJoin(broadcast(spare))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("lang").asc)))
      .withColumn("extra", (col("rk") <= col("r_slots")).cast("long"))
      .select(col("lang"), col("n_docs"), col("base"), col("extra"),
        (col("base") + col("extra")).as("alloc"))
      .orderBy("lang")
  }

  /** q220: rendezvous (highest-random-weight) shard assignment and the
    * reshard-movement audit — q122's mod-hash sharding moves ~half the
    * corpus when the shard count changes; rendezvous hashing (Thaler &
    * Ravishankar 1998, the scheme behind consistent cache/shard routers)
    * moves EXACTLY the docs whose new-shard weight wins: expected 1/(N+1)
    * of the corpus, and every moved doc lands on the NEW shard — a
    * structural invariant the spec pins. Weights are md5 strings over
    * (doc_id, shard) so both engines order them identically; the argmax
    * is an array_max over a constant-width struct array (per-row column
    * arithmetic, no explode, no shuffle before the presentation sort).
    *
    * Scale shape: one scan, O(N) work per row with N = shard count —
    * the routing-table computation a 100 TB reshard plans with before
    * moving a single byte. */
  def rendezvousReshard(spark: SparkSession, dir: String, nOld: Int = 8)
      : DataFrame = {
    def shardOf(n: Int): Column =
      array_max(array((0 until n).map(s => struct(
        md5(concat(col("doc_id").cast("string"), lit(s"#rv#$s"))).as("w"),
        lit(s.toLong).as("s"))): _*)).getField("s")
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), shardOf(nOld).as("shard_old"),
        shardOf(nOld + 1).as("shard_new"))
      .withColumn("moved",
        (col("shard_old") =!= col("shard_new")).cast("int"))
      .orderBy("doc_id")
  }

  /** q212: the curation funnel audit — the stage-by-stage retention
    * table every corpus pipeline publishes: how many documents (and
    * tokens) survive raw → exact-dedup → quality gate → language filter
    * → decontamination, cumulatively. One scan computes every per-doc
    * gate; a doc surviving through stage k contributes to stages 1..k
    * via a constant-width `sequence` explode, so the whole funnel is a
    * single map-side-combinable aggregation — not five scans.
    *
    * Gate definitions reuse the audited single-stage operators verbatim:
    * exact dedup keeps the min doc_id per md5(text) (q32), quality is
    * q29's composite ≥ 0.5, language keeps 'en' (the mixture target),
    * decontamination drops docs sharing ≥ 2 distinct 3-gram shingles
    * with the benchmark split (q71). Bench docs themselves are out of
    * scope (they are not training candidates), matching q71's output
    * domain.
    *
    * Scale shape: the dedup gate is a hash-keyed window (two-phase, no
    * global sort); the contamination flag is q71's broadcast-gated gram
    * join; everything else is per-row column arithmetic. */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val isBench = col("doc_id") % 97 === 0
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(shingles3(col("text")))).as("gram"))
    val benchGrams = grams.filter(isBench).select("gram").distinct()
    val overlap = grams.filter(!isBench)
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    val flagged = docs.filter(!isBench)
      .withColumn("tok", tokenCountWs(col("text")))
      .withColumn("is_first",
        row_number().over(Window.partitionBy(md5(col("text")))
          .orderBy("doc_id")) === 1)
      .withColumn("quality_ok", qualityScore(col("text")) >= 0.5)
      .withColumn("lang_ok", col("lang") === "en")
      .join(overlap, Seq("doc_id"), "left")
      .withColumn("clean", coalesce(col("n_overlap"), lit(0L)) < 2)
    val surv = when(!col("is_first"), 1L)
      .when(!col("quality_ok"), 2L)
      .when(!col("lang_ok"), 3L)
      .when(!col("clean"), 4L)
      .otherwise(5L)
    flagged.withColumn("stage", explode(sequence(lit(1L), surv)))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .withColumn("stage_name", element_at(typedLit(Seq(
        "raw", "exact_dedup", "quality", "language", "decontaminated")),
        col("stage").cast("int")))
      .select("stage", "stage_name", "n_docs", "n_tokens")
      .orderBy("stage")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q220_rendezvous_reshard" ->
      ((s: SparkSession, d: String) => rendezvousReshard(s, d)),
    "q215_quota_split" ->
      ((s: SparkSession, d: String) => quotaSplit(s, d)),
    "q212_curation_funnel" ->
      ((s: SparkSession, d: String) => curationFunnel(s, d)),
    "q208_budget_waterfill" ->
      ((s: SparkSession, d: String) => budgetWaterfill(s, d)),
    "q206_mixture_rebalance" ->
      ((s: SparkSession, d: String) => mixtureRebalance(s, d)),
    "q172_unimax" -> ((s: SparkSession, d: String) => unimaxMix(s, d)),
    "q147_temperature_mix" -> (temperatureMix _),
    "q77_mix_upsample"      -> (mixUpsample _),
    "q85_corpus_drift"      -> (corpusDrift _))

  val oracles: Map[String, String] = Map(
    // q220: same md5 weights, same lexicographic argmax (rank by weight
    // desc with the shard id tiebreak — md5 ties cannot occur but the
    // order is total either way)
    "q220_rendezvous_reshard" ->
      """WITH w AS (
           SELECT doc_id, s, md5(doc_id || '#rv#' || s) AS w
           FROM documents, (SELECT unnest(range(0, 9)) AS s)),
         a8 AS (
           SELECT doc_id, s AS shard_old,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY w DESC, s DESC) AS rn
           FROM w WHERE s < 8),
         a9 AS (
           SELECT doc_id, s AS shard_new,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY w DESC, s DESC) AS rn
           FROM w)
         SELECT doc_id, CAST(shard_old AS BIGINT) AS shard_old,
           CAST(shard_new AS BIGINT) AS shard_new,
           CAST(shard_old <> shard_new AS INTEGER) AS moved
         FROM a8 JOIN a9 USING (doc_id)
         WHERE a8.rn = 1 AND a9.rn = 1
         ORDER BY doc_id""",
    // q215: same Hare-quota arithmetic, same largest-remainder ranking
    "q215_quota_split" ->
      """WITH c AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY lang),
         t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM c),
         b AS (
           SELECT lang, n_docs,
             (n_total // 10) * n_docs // n_total AS base,
             ((n_total // 10) * n_docs) % n_total AS rem,
             n_total // 10 AS e_total
           FROM c, t),
         s AS (SELECT any_value(e_total) - sum(base) AS r_slots FROM b),
         r AS (
           SELECT lang, n_docs, base, rem,
             row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk
           FROM b)
         SELECT lang, n_docs, CAST(base AS BIGINT) AS base,
           CAST(CASE WHEN rk <= r_slots THEN 1 ELSE 0 END AS BIGINT)
             AS extra,
           CAST(base + CASE WHEN rk <= r_slots THEN 1 ELSE 0 END
             AS BIGINT) AS alloc
         FROM r, s ORDER BY lang""",
    // q212: the five gates replayed verbatim (q32 dedup window, q29
    // quality, lang filter, q71 gram overlap), cumulative via the same
    // 1..surv explode
    "q212_curation_funnel" ->
      s"""WITH g AS (
            SELECT doc_id, unnest(list_distinct($grams3Sql)) AS gram
            FROM documents),
          bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
          ov AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
            FROM g JOIN bench USING (gram)
            WHERE doc_id % 97 <> 0 GROUP BY doc_id),
          f AS (
            SELECT d.doc_id, len($wordsSql) AS tok,
              row_number() OVER (PARTITION BY md5(text)
                ORDER BY doc_id) = 1 AS is_first,
              $qualitySql >= 0.5 AS quality_ok,
              lang = 'en' AS lang_ok,
              coalesce(ov.n_overlap, 0) < 2 AS clean
            FROM documents d LEFT JOIN ov USING (doc_id)
            WHERE d.doc_id % 97 <> 0),
          st AS (
            SELECT tok,
              CASE WHEN NOT is_first THEN 1 WHEN NOT quality_ok THEN 2
                WHEN NOT lang_ok THEN 3 WHEN NOT clean THEN 4
                ELSE 5 END AS surv
            FROM f),
          e AS (SELECT tok, unnest(range(1, surv + 1)) AS stage FROM st)
          SELECT CAST(stage AS BIGINT) AS stage,
            ['raw', 'exact_dedup', 'quality', 'language',
             'decontaminated'][stage] AS stage_name,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(tok) AS BIGINT) AS n_tokens
          FROM e GROUP BY stage ORDER BY stage""",
    // q208: the three water-filling rounds unrolled; the budget constant
    // (2x supply) recomputes inside each stage's scalar subquery
    "q208_budget_waterfill" ->
      """WITH base AS (
           SELECT source, CAST(sum(n_chars // 4) AS BIGINT) AS supply
           FROM documents GROUP BY source),
         a0 AS (
           SELECT source, supply, supply * 4 AS cap,
             CAST(0 AS BIGINT) AS alloc
           FROM base),
         t1 AS (
           SELECT (SELECT sum(supply) * 2 FROM base) - sum(alloc)
               AS remaining,
             sum(CASE WHEN alloc < cap THEN 1 ELSE 0 END) AS n_active
           FROM a0),
         a1 AS (
           SELECT source, supply, cap,
             alloc + CASE WHEN alloc < cap
               THEN least(cap - alloc, remaining // greatest(1, n_active))
               ELSE 0 END AS alloc
           FROM a0, t1),
         t2 AS (
           SELECT (SELECT sum(supply) * 2 FROM base) - sum(alloc)
               AS remaining,
             sum(CASE WHEN alloc < cap THEN 1 ELSE 0 END) AS n_active
           FROM a1),
         a2 AS (
           SELECT source, supply, cap,
             alloc + CASE WHEN alloc < cap
               THEN least(cap - alloc, remaining // greatest(1, n_active))
               ELSE 0 END AS alloc
           FROM a1, t2),
         t3 AS (
           SELECT (SELECT sum(supply) * 2 FROM base) - sum(alloc)
               AS remaining,
             sum(CASE WHEN alloc < cap THEN 1 ELSE 0 END) AS n_active
           FROM a2),
         a3 AS (
           SELECT source, supply, cap,
             alloc + CASE WHEN alloc < cap
               THEN least(cap - alloc, remaining // greatest(1, n_active))
               ELSE 0 END AS alloc
           FROM a2, t3)
         SELECT source, supply, cap, CAST(alloc AS BIGINT) AS alloc,
           CAST(1000000 * alloc // greatest(1, supply) AS BIGINT)
             AS epochs_ppm,
           CAST(alloc >= cap AS INTEGER) AS saturated
         FROM a3 ORDER BY source""",
    // q206: the three MW rounds unrolled as CTE stages (the q179 BT-MM
    // oracle pattern); every step is integer ppb DIV on both engines
    "q206_mixture_rebalance" ->
      """WITH base AS (
           SELECT source, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chars
           FROM documents GROUP BY source),
         tot AS (
           SELECT CAST(sum(c) AS BIGINT) AS n_total,
             CAST(count(*) AS BIGINT) AS n_dom FROM base),
         w0 AS (
           SELECT source, c, mean_chars,
             1000000000 * c // n_total AS w,
             1000000000 // n_dom AS t,
             1 + mean_chars % 7 AS d
           FROM base, tot),
         s0 AS (SELECT CAST(sum(w) AS BIGINT) AS s_w FROM w0),
         w1 AS (
           SELECT source, c, mean_chars, t, d,
             w + (w * d * (t - (1000000000 * w // s_w))) // 8000000000 AS w
           FROM w0, s0),
         s1 AS (SELECT CAST(sum(w) AS BIGINT) AS s_w FROM w1),
         w2 AS (
           SELECT source, c, mean_chars, t, d,
             w + (w * d * (t - (1000000000 * w // s_w))) // 8000000000 AS w
           FROM w1, s1),
         s2 AS (SELECT CAST(sum(w) AS BIGINT) AS s_w FROM w2),
         w3 AS (
           SELECT source, c, mean_chars, t, d,
             w + (w * d * (t - (1000000000 * w // s_w))) // 8000000000 AS w
           FROM w2, s2),
         s3 AS (SELECT CAST(sum(w) AS BIGINT) AS s_w FROM w3)
         SELECT source, c AS n_docs, mean_chars, d AS step_mult,
           w AS weight_raw, 1000000000 * w // s_w AS share_ppb
         FROM w3, s3 ORDER BY source""",
    // integer sqrt (floor of the correctly-rounded IEEE sqrt both engines
    // share), order-free BIGINT sums, hex-string slot compare — exact
    "q147_temperature_mix" ->
      """WITH c AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS c_lang,
             CAST(floor(sqrt(CAST(count(*) * 1000000 AS DOUBLE)))
               AS BIGINT) AS w
           FROM documents GROUP BY lang),
         t AS (SELECT CAST(sum(c_lang) AS BIGINT) AS n_total,
                 CAST(sum(w) AS BIGINT) AS s_w FROM c),
         r AS (
           SELECT lang, c_lang,
             (1000000 * w * n_total) // (s_w * c_lang) AS factor_ppm
           FROM c CROSS JOIN t)
         SELECT d.doc_id, d.lang, r.c_lang, r.factor_ppm,
           factor_ppm // 1000000 +
             CASE WHEN substring(md5(CAST(d.doc_id AS VARCHAR) || '#temp42'),
                 1, 4) <
               printf('%04x', CAST((factor_ppm % 1000000) * 65536 // 1000000
                 AS INT)) THEN 1 ELSE 0 END AS n_copies
         FROM documents d JOIN r USING (lang)
         ORDER BY doc_id""",
    // q58's md5 membership function, applied to the FRACTIONAL part of the
    // replication weight (en 0.3→0x4ccc, de 2.5→0x8000, zh 0.7→0xb333)
    "q77_mix_upsample" ->
      """WITH w AS (
           SELECT doc_id, lang,
             CASE lang
               WHEN 'en' THEN CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '#mix42'), 1, 4) < '4ccc' THEN 1 ELSE 0 END
               WHEN 'de' THEN 2 + CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '#mix42'), 1, 4) < '8000' THEN 1 ELSE 0 END
               WHEN 'fr' THEN 1
               WHEN 'es' THEN 2
               WHEN 'zh' THEN CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '#mix42'), 1, 4) < 'b333' THEN 1 ELSE 0 END
               ELSE 0 END AS n_copies
           FROM documents)
         SELECT doc_id, lang,
           CAST(unnest(generate_series(1, n_copies)) AS INTEGER) AS copy_no
         FROM w WHERE n_copies > 0 ORDER BY doc_id, copy_no""",
    // integer-ppm shares (BIGINT division truncates identically in both
    // engines), full-outer per-language join, 1% drift gate
    "q85_corpus_drift" ->
      """WITH b AS (
           SELECT lang,
             count(*) * 1000000 // (SELECT count(*) FROM documents
                                    WHERE doc_id % 4 <> 0) AS ppm_before
           FROM documents WHERE doc_id % 4 <> 0 GROUP BY lang),
         a AS (
           SELECT lang,
             count(*) * 1000000 // (SELECT count(*) FROM documents)
               AS ppm_after
           FROM documents GROUP BY lang)
         SELECT coalesce(b.lang, a.lang) AS lang,
           CAST(coalesce(b.ppm_before, 0) AS BIGINT) AS ppm_before,
           CAST(coalesce(a.ppm_after, 0) AS BIGINT) AS ppm_after,
           CAST(coalesce(a.ppm_after, 0) - coalesce(b.ppm_before, 0)
             AS BIGINT) AS delta_ppm,
           CASE WHEN abs(coalesce(a.ppm_after, 0)
                         - coalesce(b.ppm_before, 0)) > 10000
                THEN 1 ELSE 0 END AS drifted
         FROM b FULL OUTER JOIN a ON b.lang = a.lang
         ORDER BY lang""",
    // same smallest-first fold: min(cap·tokens, rem DIV remaining) per
    // step, unrolled as a recursive CTE over the (tokens, lang) order
    "q172_unimax" ->
      s"""WITH RECURSIVE sizes AS (
            SELECT lang, CAST(sum(len($wordsSql)) AS BIGINT) AS n_tokens
            FROM documents GROUP BY lang),
          tot AS (
            SELECT CAST(sum(n_tokens) * 6 // 10 AS BIGINT) AS b,
              CAST(count(*) AS BIGINT) AS k FROM sizes),
          ord AS (
            SELECT lang, n_tokens,
              row_number() OVER (ORDER BY n_tokens, lang) AS rn
            FROM sizes),
          st AS (
            SELECT CAST(0 AS BIGINT) AS rn, b AS rem,
              CAST(0 AS BIGINT) AS alloc,
              CAST(NULL AS VARCHAR) AS lang,
              CAST(0 AS BIGINT) AS n_tokens, k
            FROM tot
            UNION ALL
            SELECT o.rn, st.rem - least(3 * o.n_tokens,
                st.rem // (st.k - st.rn)),
              least(3 * o.n_tokens, st.rem // (st.k - st.rn)),
              o.lang, o.n_tokens, st.k
            FROM st JOIN ord o ON o.rn = st.rn + 1)
          SELECT lang, n_tokens, alloc AS budget,
            CAST(alloc * 1000000 // n_tokens AS BIGINT) AS epochs_ppm
          FROM st WHERE rn >= 1 ORDER BY lang""")
}
