package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed n-gram language-model surface — the corpus-statistics side
  * of quality filtering (CCNet's KenLM gate, here in the shuffle-friendly
  * stupid-backoff form of Brants et al. 2007, "Large Language Models in
  * Machine Translation") plus the reference-pair text-eval metrics every
  * generation pipeline reports (BLEU clipped n-gram precision, Papineni et
  * al. 2002; ROUGE-N recall, Lin 2004).
  *
  * Reference provenance: the reference's notebooks gate silver rows with
  * static DQ rules only (ref 03_silver notebook expectations); an LLM-corpus
  * deployment of the same medallion adds model-based quality scores at the
  * same point in the pipeline, which is where these queries sit.
  *
  * Determinism contract (the q143/q179 recipe): every score is integer
  * rational — per-token probabilities in ppm via integer `DIV`, summed as
  * BIGINTs — so the DuckDB oracle hash-compares bit-for-bit. No doubles,
  * no `log`/`exp`; the monotone structure of the scores is what the
  * downstream gate consumes (rank/threshold), not their absolute scale.
  *
  * Scale shape:
  *   - Count tables (`c_w`, `c_bg`) are map-side-combinable groupBys over
  *     the token stream — the exact shape Brants et al. distribute; they
  *     shuffle once on the gram key and are reused via cache for the two
  *     scoring joins.
  *   - Scoring is three equi-joins keyed on the gram — at cluster scale
  *     these hash-partition by vocabulary, never by document, so skewed
  *     documents don't skew the join (only the token stream's own
  *     distribution does, and stop-word keys are diluted by pre-aggregated
  *     count frames on the build side).
  *   - The only per-document ordering is the `lag` window partitioned by
  *     doc_id — bounded by document length, the same bound the tokenizer
  *     already imposes.
  *   - The corpus-total token count is a single-row frame crossJoined in
  *     (broadcast by AQE), the repo-standard scalar pattern.
  */
object LmQueries {

  private def toks(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      // the single-file fixture reads as one task; spread tokenization
      // across cores on the key the per-doc windows hash on anyway (the
      // q37 recipe — a real multi-file corpus arrives pre-spread, and
      // the explode preserves this partitioning so the lag window needs
      // only a local sort)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+"))
          .as(Seq("pos", "w")))

  /** q200: stupid-backoff bigram scoring of every document against a
    * model trained on the even-doc_id half of the corpus (the CCNet
    * shape: the LM is fit on a reference corpus — there, Wikipedia — and
    * scores candidate documents; training on the scored corpus itself
    * would make every bigram "seen" and the backoff dead).
    *
    * Complements q145 (`SearchQueries.ngramLmScore`), which is the
    * ADDITIVE-smoothing family (add-1 over a reference slice — every
    * transition gets probability mass, no OOV/backoff distinction):
    * stupid backoff is the smoothing Brants et al. chose precisely
    * because it distributes (no normalization pass), and its backoff and
    * OOV RATES are themselves the filter signals this query emits.
    *
    * Per token: P(w|w1) = c(w1,w)/c(w1) when the training half saw the
    * bigram, else α·c(w)/N with α=0.4 (Brants et al.'s fixed backoff
    * weight); a document's first token has no history and scores c(w)/N;
    * a word the training half never saw scores 0 and is counted in
    * `n_oov`. All in ppm by integer DIV, summed per document;
    * `n_backoff` counts the tokens that fell to the unigram — itself a
    * fluency signal (token sequences the reference corpus never saw). */
  def backoffLm(spark: SparkSession, dir: String): DataFrame = {
    val t = toks(spark, dir)
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val withPrev = t.withColumn("w1", lag(col("w"), 1).over(byDoc))
    // model statistics over the training half: one shuffle each,
    // map-side combined
    val train = withPrev.filter(col("doc_id") % 2 === 0)
    val uni = train.groupBy("w").agg(count(lit(1)).as("c_w"))
    val bg = train.filter(col("w1").isNotNull)
      .groupBy("w1", "w").agg(count(lit(1)).as("c_bg"))
    val total = uni.agg(sum(col("c_w")).as("n_total"))
    val scored = withPrev
      .join(uni, Seq("w"), "left")
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_prev")),
        Seq("w1"), "left")
      .join(bg, Seq("w1", "w"), "left")
      .crossJoin(total)
      .select(col("doc_id"),
        when(col("c_w").isNull, lit(0L))
          .when(col("w1").isNull, expr("1000000 * c_w DIV n_total"))
          .when(col("c_bg").isNotNull, expr("1000000 * c_bg DIV c_prev"))
          .otherwise(expr("400000 * c_w DIV n_total")).as("p_ppm"),
        when(col("c_w").isNull, lit(1L)).otherwise(lit(0L)).as("oov"),
        when(col("c_w").isNotNull && col("w1").isNotNull &&
          col("c_bg").isNull, lit(1L)).otherwise(lit(0L)).as("backed"))
    scored.groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        sum(col("oov")).as("n_oov"),
        sum(col("backed")).as("n_backoff"),
        sum(col("p_ppm")).as("sum_p_ppm"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        col("n_backoff"), col("sum_p_ppm"),
        expr("sum_p_ppm DIV n_tokens").as("avg_p_ppm"))
      .orderBy("doc_id")
  }

  /** q201: BLEU/ROUGE-N components for each (candidate, reference) pair,
    * where the reference is the previous document of the same source (a
    * deterministic pairing standing in for the judged pairs a real eval
    * harness supplies).
    *
    * Per pair: clipped 1/2-gram overlap (count of candidate grams matched,
    * each gram clipped at its reference count — the BLEU modification),
    * precision and recall in ppm, the brevity ratio min(1, |c|/|r|) in
    * ppm, and a rational BLEU-2 lowering bp·p1·p2 (the geometric mean is
    * irrational; the product preserves its ordering for fixed n and is
    * integer-exact). Single-token candidates have no bigrams: p2/r2 and
    * the composite are NULL, mirrored in the oracle. */
  def bleuRouge(spark: SparkSession, dir: String): DataFrame = {
    val bySource = Window.partitionBy("source").orderBy("doc_id")
    val pairs = Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        lag(col("doc_id"), 1).over(bySource).as("ref_id"))
      .filter(col("ref_id").isNotNull)
      .select(col("doc_id").as("cand_id"), col("ref_id"))
    val t = toks(spark, dir)
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    // per-doc gram count frames, n = 1 and 2 (bigram key = "w1 w")
    val g1 = t.groupBy(col("doc_id"), col("w").as("g"))
      .agg(count(lit(1)).as("c"))
    val g2 = t.withColumn("w1", lag(col("w"), 1).over(byDoc))
      .filter(col("w1").isNotNull)
      .groupBy(col("doc_id"), concat_ws(" ", col("w1"), col("w")).as("g"))
      .agg(count(lit(1)).as("c"))
    def clipped(g: DataFrame): DataFrame = pairs
      .join(g.select(col("doc_id").as("cand_id"), col("g"),
        col("c").as("c_cand")), Seq("cand_id"))
      .join(g.select(col("doc_id").as("ref_id"), col("g"),
        col("c").as("c_ref")), Seq("ref_id", "g"), "left")
      .groupBy("cand_id", "ref_id").agg(
        sum(col("c_cand")).as("n_cand"),
        sum(least(col("c_cand"), coalesce(col("c_ref"), lit(0L))))
          .as("n_clip"))
    val refLen = g1.groupBy(col("doc_id").as("ref_id"))
      .agg(sum(col("c")).as("r1"))
    val refLen2 = g2.groupBy(col("doc_id").as("ref_id"))
      .agg(sum(col("c")).as("r2"))
    val c1 = clipped(g1).withColumnRenamed("n_cand", "c1")
      .withColumnRenamed("n_clip", "clip1")
    val c2 = clipped(g2).withColumnRenamed("n_cand", "c2")
      .withColumnRenamed("n_clip", "clip2")
    c1.join(c2, Seq("cand_id", "ref_id"), "left")
      .join(refLen, Seq("ref_id"))
      .join(refLen2, Seq("ref_id"), "left")
      .select(col("cand_id"), col("ref_id"),
        col("c1"), col("r1"), col("clip1"),
        coalesce(col("c2"), lit(0L)).as("c2"),
        coalesce(col("r2"), lit(0L)).as("r2"),
        coalesce(col("clip2"), lit(0L)).as("clip2"))
      .select(col("cand_id"), col("ref_id"), col("c1"), col("r1"),
        col("clip1"), col("c2"), col("r2"), col("clip2"),
        expr("1000000 * clip1 DIV c1").as("p1_ppm"),
        expr("1000000 * clip1 DIV r1").as("rouge1_ppm"),
        expr("CASE WHEN c2 > 0 THEN 1000000 * clip2 DIV c2 END")
          .as("p2_ppm"),
        expr("CASE WHEN r2 > 0 THEN 1000000 * clip2 DIV r2 END")
          .as("rouge2_ppm"),
        least(lit(1000000L), expr("1000000 * c1 DIV r1")).as("bp_ppm"))
      .withColumn("bleu2_ppm",
        expr("""CASE WHEN p2_ppm IS NOT NULL THEN
                  bp_ppm * (p1_ppm * p2_ppm DIV 1000000) DIV 1000000
                END"""))
      .orderBy("cand_id")
  }

  /** q203: pairwise total-variation distance between the unigram
    * distributions of every source pair — the rational-arithmetic member
    * of the distribution-drift family (q85 language-mix deltas, q185 χ²,
    * q193 KS on lengths): TV = ½·Σ_w |p_a(w) − p_b(w)| needs no log, so
    * unlike KL/JS it is integer-exact. The mixing stage uses it to spot
    * redundant feeds (TV ≈ 0 → candidate for dedup/downweight) and
    * outlier feeds before they skew the training mix.
    *
    * Arithmetic: per-word shares in ppb by integer DIV (deterministic
    * truncation, identical in both engines); the missing-mass terms
    * (words one source never uses) come from each source's total share
    * minus its share over the SHARED vocabulary, so the inner word join
    * suffices — no outer join over V×S² rows.
    *
    * Scale shape: the per-source unigram table shuffles once on the word
    * key; the pair expansion is word-keyed (a word in k sources emits
    * C(k,2) rows — S is feed-count-sized, tens, so the blowup is bounded
    * by S²·V, not corpus size); the zero-overlap backstop cross-join is
    * over the S-row source list only. */
  def sourceTv(spark: SparkSession, dir: String): DataFrame = {
    val wc = Tables.load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val totals = wc.groupBy("source").agg(sum(col("c")).as("n_tok"))
    val u = wc.join(totals, Seq("source"))
      .select(col("source"), col("w"),
        expr("1000000000 * c DIV n_tok").as("p"))
    val tot = u.groupBy("source").agg(sum(col("p")).as("tp"))
    val shared = u.as("a").join(u.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"),
        sum(abs(col("a.p") - col("b.p"))).as("d_shared"),
        sum(col("a.p")).as("pa_shared"),
        sum(col("b.p")).as("pb_shared"))
    // zero-overlap pairs still have a defined TV (all mass disjoint)
    val srcs = tot.select(col("source"), col("tp"))
    val pairs = srcs.as("a").join(srcs.as("b"),
        col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.tp").as("tp_a"), col("b.tp").as("tp_b"))
    pairs.join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        expr("""(coalesce(d_shared, CAST(0 AS BIGINT))
                + (tp_a - coalesce(pa_shared, CAST(0 AS BIGINT)))
                + (tp_b - coalesce(pb_shared, CAST(0 AS BIGINT))))
                DIV 2""").as("tv_ppb"))
      .orderBy("src_a", "src_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q200_backoff_lm" ->
      ((s: SparkSession, d: String) => backoffLm(s, d)),
    "q201_bleu_rouge" ->
      ((s: SparkSession, d: String) => bleuRouge(s, d)),
    "q203_source_tv" ->
      ((s: SparkSession, d: String) => sourceTv(s, d)))

  val oracles: Map[String, String] = Map(
    // same tokenization, same even-half training split, same ppm
    // rationals and α=0.4 backoff
    "q200_backoff_lm" ->
      raw"""WITH d AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+')
             AS toks FROM documents),
         t AS (
           SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, toks
           FROM d),
         tok AS (
           SELECT doc_id, pos, toks[pos] AS w,
             CASE WHEN pos > 1 THEN toks[pos - 1] END AS w1
           FROM t),
         uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c_w
                 FROM tok WHERE doc_id % 2 = 0 GROUP BY w),
         bg AS (SELECT w1, w, CAST(count(*) AS BIGINT) AS c_bg
                FROM tok WHERE doc_id % 2 = 0 AND w1 IS NOT NULL
                GROUP BY w1, w),
         tot AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_total FROM uni),
         scored AS (
           SELECT tok.doc_id,
             CASE
               WHEN uni.c_w IS NULL THEN 0
               WHEN tok.w1 IS NULL THEN 1000000 * uni.c_w // tot.n_total
               WHEN bg.c_bg IS NOT NULL THEN 1000000 * bg.c_bg // p.c_w
               ELSE 400000 * uni.c_w // tot.n_total
             END AS p_ppm,
             CASE WHEN uni.c_w IS NULL THEN 1 ELSE 0 END AS oov,
             CASE WHEN uni.c_w IS NOT NULL AND tok.w1 IS NOT NULL
               AND bg.c_bg IS NULL THEN 1 ELSE 0 END AS backed
           FROM tok
           LEFT JOIN uni ON uni.w = tok.w
           LEFT JOIN uni p ON p.w = tok.w1
           LEFT JOIN bg ON bg.w1 = tok.w1 AND bg.w = tok.w
           CROSS JOIN tot)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           CAST(sum(backed) AS BIGINT) AS n_backoff,
           CAST(sum(p_ppm) AS BIGINT) AS sum_p_ppm,
           CAST(sum(p_ppm) AS BIGINT) // CAST(count(*) AS BIGINT)
             AS avg_p_ppm
         FROM scored GROUP BY doc_id ORDER BY doc_id""",
    // same previous-doc-of-source pairing, same clipping and rationals
    "q201_bleu_rouge" ->
      raw"""WITH d AS (
           SELECT doc_id, source,
             string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         pairs AS (
           SELECT doc_id AS cand_id,
             lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id)
               AS ref_id
           FROM d QUALIFY ref_id IS NOT NULL),
         t AS (
           SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, toks
           FROM d),
         tok AS (
           SELECT doc_id, pos, toks[pos] AS w,
             CASE WHEN pos > 1 THEN toks[pos - 1] END AS w1
           FROM t),
         g1 AS (SELECT doc_id, w AS g, CAST(count(*) AS BIGINT) AS c
                FROM tok GROUP BY doc_id, w),
         g2 AS (SELECT doc_id, w1 || ' ' || w AS g,
                  CAST(count(*) AS BIGINT) AS c
                FROM tok WHERE w1 IS NOT NULL GROUP BY doc_id, g),
         c1 AS (
           SELECT p.cand_id, p.ref_id,
             CAST(sum(a.c) AS BIGINT) AS c1,
             CAST(sum(least(a.c, coalesce(b.c, 0))) AS BIGINT) AS clip1
           FROM pairs p
           JOIN g1 a ON a.doc_id = p.cand_id
           LEFT JOIN g1 b ON b.doc_id = p.ref_id AND b.g = a.g
           GROUP BY p.cand_id, p.ref_id),
         c2 AS (
           SELECT p.cand_id, p.ref_id,
             CAST(sum(a.c) AS BIGINT) AS c2,
             CAST(sum(least(a.c, coalesce(b.c, 0))) AS BIGINT) AS clip2
           FROM pairs p
           JOIN g2 a ON a.doc_id = p.cand_id
           LEFT JOIN g2 b ON b.doc_id = p.ref_id AND b.g = a.g
           GROUP BY p.cand_id, p.ref_id),
         rl AS (SELECT doc_id AS ref_id, CAST(sum(c) AS BIGINT) AS r1
                FROM g1 GROUP BY doc_id),
         rl2 AS (SELECT doc_id AS ref_id, CAST(sum(c) AS BIGINT) AS r2
                 FROM g2 GROUP BY doc_id),
         j AS (
           SELECT c1.cand_id, c1.ref_id, c1.c1, rl.r1, c1.clip1,
             coalesce(c2.c2, 0) AS c2, coalesce(rl2.r2, 0) AS r2,
             coalesce(c2.clip2, 0) AS clip2
           FROM c1
           LEFT JOIN c2 ON c2.cand_id = c1.cand_id
             AND c2.ref_id = c1.ref_id
           JOIN rl ON rl.ref_id = c1.ref_id
           LEFT JOIN rl2 ON rl2.ref_id = c1.ref_id),
         m AS (
           SELECT cand_id, ref_id, c1, r1, clip1, c2, r2, clip2,
             1000000 * clip1 // c1 AS p1_ppm,
             1000000 * clip1 // r1 AS rouge1_ppm,
             CASE WHEN c2 > 0 THEN 1000000 * clip2 // c2 END AS p2_ppm,
             CASE WHEN r2 > 0 THEN 1000000 * clip2 // r2 END
               AS rouge2_ppm,
             least(1000000, 1000000 * c1 // r1) AS bp_ppm
           FROM j)
         SELECT cand_id, ref_id, c1, r1, clip1, c2, r2, clip2,
           p1_ppm, rouge1_ppm, p2_ppm, rouge2_ppm, bp_ppm,
           CASE WHEN p2_ppm IS NOT NULL THEN
             bp_ppm * (p1_ppm * p2_ppm // 1000000) // 1000000
           END AS bleu2_ppm
         FROM m ORDER BY cand_id""",
    // same ppb shares, same shared-vocabulary missing-mass fold
    "q203_source_tv" ->
      raw"""WITH wc AS (
           SELECT source, w, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT source,
                   unnest(string_split_regex(trim(lower(text)), '\s+'))
                     AS w
                 FROM documents)
           GROUP BY source, w),
         t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tok
               FROM wc GROUP BY source),
         u AS (
           SELECT wc.source, wc.w, 1000000000 * wc.c // t.n_tok AS p
           FROM wc JOIN t ON t.source = wc.source),
         tot AS (SELECT source, CAST(sum(p) AS BIGINT) AS tp
                 FROM u GROUP BY source),
         shared AS (
           SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_shared,
             CAST(sum(abs(a.p - b.p)) AS BIGINT) AS d_shared,
             CAST(sum(a.p) AS BIGINT) AS pa_shared,
             CAST(sum(b.p) AS BIGINT) AS pb_shared
           FROM u a JOIN u b ON a.w = b.w AND a.source < b.source
           GROUP BY a.source, b.source)
         SELECT pa.source AS src_a, pb.source AS src_b,
           coalesce(s.n_shared, 0) AS n_shared,
           (coalesce(s.d_shared, 0)
             + (pa.tp - coalesce(s.pa_shared, 0))
             + (pb.tp - coalesce(s.pb_shared, 0))) // 2 AS tv_ppb
         FROM tot pa
         JOIN tot pb ON pa.source < pb.source
         LEFT JOIN shared s ON s.src_a = pa.source AND s.src_b = pb.source
         ORDER BY src_a, src_b""")
}
