package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Privacy release gates over the `documents` table — the three-rung
  * compliance ladder a corpus release runs AFTER direct-identifier
  * redaction (TextQueries.piiRedact): k-anonymity (cell size,
  * Sweeney 2002), l-diversity (within-cell sensitive diversity,
  * Machanavajjhala et al. 2007), t-closeness (cell-vs-table sensitive
  * DISTRIBUTION skew, Li et al., ICDE 2007). Split out of TextQueries
  * along the seam VERDICT r10 #8 named — same queries, same oracles,
  * no behavior change.
  *
  * Scale posture shared by all three: map-side-combined hash aggregates
  * bounded by the quasi-identifier cross-product (cells × langs at
  * worst), never corpus-scaled; the one deliberate expansion (q230's
  * cells × langs) rides a broadcast of the bounded language table. */
object PrivacyQueries {

  /** k-anonymity audit over quasi-identifiers — the compliance gate a
    * dataset release runs after PII redaction (q76 removes direct
    * identifiers; this measures re-identification risk from the
    * REMAINING attributes, Sweeney 2002): group by the quasi-identifier
    * tuple (lang, source, length bucket), and any group smaller than k=5
    * must be suppressed or generalized before release. Output is the
    * per-group audit table with exact re-identification risk in ppm.
    *
    * Scale shape: one map-side-combined hash aggregation (bounded by the
    * quasi-identifier cross-product, not the corpus) plus presentation
    * sort. */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5)
      : DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(col("lang"), col("source"),
        expr("n_chars DIV 500").as("len_bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("lang"), col("source"), col("len_bucket"), col("n"),
        (col("n") < k).cast("int").as("suppress"),
        expr("1000000 DIV n").as("risk_ppm"))
      .orderBy("lang", "source", "len_bucket")

  /** q218: l-diversity audit (Machanavajjhala et al. 2007) — q157's
    * k-anonymity counts how many records share a quasi-identifier
    * cell; this measures whether the SENSITIVE attribute inside each
    * cell is diverse enough to resist homogeneity attacks: a cell where
    * everyone shares one language leaks the language even at k=100.
    * Per (source, len_bucket) cell: size, distinct sensitive values
    * (lang), the dominant value's share in ppm, and the distinct-l
    * gate. One two-level aggregate (cell×lang counts, then an argmax
    * window keyed by cell — cardinality ~ cells, no skew funnel).
    * Exactly the audit a privacy-gated corpus release runs after q76's
    * redaction and q157's suppression. */
  def lDiversity(spark: SparkSession, dir: String, l: Int = 2)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.load(spark, dir, "documents")
      .groupBy(col("source"), expr("n_chars DIV 500").as("len_bucket"),
        col("lang"))
      .agg(count(lit(1)).as("n_lang"))
    val w = Window.partitionBy("source", "len_bucket")
    cells
      .withColumn("n", sum(col("n_lang")).over(w))
      .withColumn("n_distinct", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("n_lang").desc, col("lang").asc)))
      .filter(col("rk") === 1)
      .select(col("source"), col("len_bucket"), col("n"),
        col("n_distinct"),
        expr("1000000 * n_lang DIV n").as("dominant_ppm"),
        (col("n_distinct") < l).cast("int").as("homogeneous"))
      .orderBy("source", "len_bucket")
  }

  /** q230: t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    * the third rung of the release-gate ladder after q157 (cell size)
    * and q218 (within-cell diversity): a cell can be large AND diverse
    * yet still leak if its sensitive-attribute DISTRIBUTION deviates
    * from the table's (skewness attack — "this cell is 90% one lang
    * where the corpus is 20%"). For categorical attributes with uniform
    * ground distance, the paper's EMD reduces to total variation:
    * ½ Σ_v |p_cell(v) − p_global(v)|. Emitted as the DOUBLED integer
    * sum (`tv_x2_ppm = Σ |ppm_cell − ppm_global|`, each share truncated
    * to ppm first) so both engines do identical integer arithmetic —
    * no halving truncation to disagree on. `breach` gates at t.
    *
    * Scale shape: two map-side-combined hash aggregates (cell×lang,
    * lang), then a cells × langs expansion via BROADCAST of the
    * bounded (langs, total) tables — absent languages must contribute
    * their full global share, so the expansion is deliberate and its
    * cardinality is cells × |langs|, never corpus-scaled. */
  def tCloseness(spark: SparkSession, dir: String, tPpm: Long = 200000L)
      : DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), expr("n_chars DIV 500").as("len_bucket"),
        col("lang"))
    val global = docs.groupBy("lang").agg(count(lit(1)).as("n_lang_g"))
    val totals = global.agg(sum(col("n_lang_g")).as("n_total"))
    val cellLang = docs.groupBy("source", "len_bucket", "lang")
      .agg(count(lit(1)).as("n_cl"))
    val cells = cellLang.groupBy("source", "len_bucket")
      .agg(sum(col("n_cl")).as("n_cell"))
    cells
      .crossJoin(broadcast(global))
      .crossJoin(broadcast(totals))
      .join(cellLang, Seq("source", "len_bucket", "lang"), "left")
      .withColumn("n_cl", coalesce(col("n_cl"), lit(0L)))
      .withColumn("d", abs(expr("1000000 * n_cl DIV n_cell") -
        expr("1000000 * n_lang_g DIV n_total")))
      .groupBy("source", "len_bucket", "n_cell")
      .agg(sum(col("d")).as("tv_x2_ppm"))
      .select(col("source"), col("len_bucket"), col("n_cell"),
        col("tv_x2_ppm"),
        (col("tv_x2_ppm") > 2 * tPpm).cast("int").as("breach"))
      .orderBy("source", "len_bucket")
  }

  /** q236: LOCAL-DP frequency release via generalized randomized
    * response (Warner 1965; k-ary form per Kairouz et al. 2016) — the
    * MECHANISM rung completing the ladder the three audits (q157 /
    * q218 / q230) only measure: each row reports its true language with
    * probability p = 3/4 and one of the k−1 others uniformly otherwise,
    * giving ε = ln(p/q) = ln(3(k−1)) local differential privacy; the
    * curator debiases the observed counts with the standard unbiased
    * estimator est = (obs − n·q)/(p − q) where q = (1−p)/(k−1), folded
    * to exact integers: est = (4(k−1)·obs − n) / (3k − 4), clamped at 0
    * before the single integer division (negative estimates clamp in
    * practice, and clamping keeps DIV semantics engine-identical —
    * DuckDB's `//` floors where Spark's DIV truncates, which only
    * diverge below zero). Coins come from disjoint slices of one seeded
    * md5 per row, so both engines replay the exact mechanism.
    *
    * Scale shape: the label dictionary is bounded (k languages — the
    * row_number window and the count() run over k rows, metadata
    * scale), so the index map rides a broadcast; the per-row mechanism
    * is one codegen'd map pass over the corpus; the release is a k-row
    * hash-agg. Nothing driver-side scales with data. */
  def randomizedResponse(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
    // bounded label dictionary: k rows, contiguous ids by label order
    val labs = docs.select(col("lang")).distinct()
      .withColumn("idx",
        row_number().over(Window.orderBy("lang")).cast("long") - 1)
    val k = labs.count() // driver-bounded: #languages, never data
    require(k >= 2, s"randomized response needs >= 2 labels, corpus has $k")
    // one md5 per row, two disjoint slices: hex[1,4] < 'c000' keeps the
    // true label (p = 49152/65536 = 3/4 exactly); hex[5,4] mod (k-1)
    // picks the uniform other label via the 1+j rotation (never self)
    val h = md5(concat(col("doc_id").cast("string"), lit("#rr42")))
    val keep = substring(h, 1, 4) < "c000"
    val j = expr("CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), " +
      s"'#rr42')), 5, 4), 16, 10) AS BIGINT) % ${k - 1}")
    val reported = docs
      .join(broadcast(labs), Seq("lang"))
      .withColumn("rep_idx",
        when(keep, col("idx")).otherwise((col("idx") + lit(1L) + j) % k))
    val obs = reported.groupBy("rep_idx").agg(count(lit(1)).as("obs_n"))
    val truth = reported.groupBy("lang", "idx")
      .agg(count(lit(1)).as("true_n"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    truth
      .join(obs, col("idx") === col("rep_idx"), "left")
      .crossJoin(broadcast(total))
      .withColumn("obs_n", coalesce(col("obs_n"), lit(0L)))
      .withColumn("est_n", expr(
        s"greatest(0L, ${4 * (k - 1)} * obs_n - n_total) DIV ${3 * k - 4}"))
      .select(col("lang"), col("true_n"), col("obs_n"), col("est_n"),
        abs(col("est_n") - col("true_n")).as("abs_err"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q157_k_anonymity" -> ((s: SparkSession, d: String) => kAnonymity(s, d)),
    "q236_randomized_response" ->
      ((s: SparkSession, d: String) => randomizedResponse(s, d)),
    "q218_l_diversity" ->
      ((s: SparkSession, d: String) => lDiversity(s, d)),
    "q230_t_closeness" ->
      ((s: SparkSession, d: String) => tCloseness(s, d)))

  val oracles: Map[String, String] = Map(
    // q236: same seeded md5 coins (keep slice, pick slice), same 1+j
    // rotation, same clamped integer estimator — mechanism replayed
    "q236_randomized_response" ->
      """WITH labs AS (
           SELECT lang,
             CAST(row_number() OVER (ORDER BY lang) - 1 AS BIGINT) AS idx
           FROM (SELECT DISTINCT lang FROM documents)),
         kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM labs),
         r AS (
           SELECT d.doc_id, d.lang, l.idx,
             CASE WHEN substring(md5(CAST(d.doc_id AS VARCHAR) || '#rr42'),
                 1, 4) < 'c000'
               THEN l.idx
               ELSE (l.idx + 1 +
                 (CAST(CONCAT('0x', substring(
                    md5(CAST(d.doc_id AS VARCHAR) || '#rr42'), 5, 4))
                  AS BIGINT) % (kk.k - 1))) % kk.k
             END AS rep_idx
           FROM documents d JOIN labs l ON d.lang = l.lang CROSS JOIN kk),
         obs AS (SELECT rep_idx, CAST(count(*) AS BIGINT) AS obs_n
                 FROM r GROUP BY rep_idx),
         tr AS (SELECT lang, idx, CAST(count(*) AS BIGINT) AS true_n
                FROM r GROUP BY lang, idx),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents)
         SELECT tr.lang, tr.true_n,
           COALESCE(obs.obs_n, 0) AS obs_n,
           CAST(greatest(0, 4 * (kk.k - 1) * COALESCE(obs.obs_n, 0)
               - tot.n_total) // (3 * kk.k - 4) AS BIGINT) AS est_n,
           CAST(abs(CAST(greatest(0, 4 * (kk.k - 1)
               * COALESCE(obs.obs_n, 0) - tot.n_total)
               // (3 * kk.k - 4) AS BIGINT) - tr.true_n) AS BIGINT)
             AS abs_err
         FROM tr LEFT JOIN obs ON tr.idx = obs.rep_idx
         CROSS JOIN kk CROSS JOIN tot
         ORDER BY lang""",
    // same quasi-identifier tuple, same integer risk — exact
    "q157_k_anonymity" ->
      """SELECT lang, source, n_chars // 500 AS len_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS suppress,
           1000000 // count(*) AS risk_ppm
         FROM documents
         GROUP BY lang, source, n_chars // 500
         ORDER BY lang, source, len_bucket""",
    // q218: same two-level aggregate, same argmax tiebreak
    "q218_l_diversity" ->
      """WITH c AS (
           SELECT source, n_chars // 500 AS len_bucket, lang,
             CAST(count(*) AS BIGINT) AS n_lang
           FROM documents GROUP BY 1, 2, 3),
         t AS (
           SELECT source, len_bucket, lang, n_lang,
             CAST(sum(n_lang) OVER (PARTITION BY source, len_bucket)
               AS BIGINT) AS n,
             CAST(count(*) OVER (PARTITION BY source, len_bucket)
               AS BIGINT) AS n_distinct,
             row_number() OVER (PARTITION BY source, len_bucket
               ORDER BY n_lang DESC, lang ASC) AS rk
           FROM c)
         SELECT source, CAST(len_bucket AS BIGINT) AS len_bucket, n,
           n_distinct,
           CAST(1000000 * n_lang // n AS BIGINT) AS dominant_ppm,
           CAST(CASE WHEN n_distinct < 2 THEN 1 ELSE 0 END AS INTEGER)
             AS homogeneous
         FROM t WHERE rk = 1 ORDER BY source, len_bucket""",
    // q230: same cells × global-langs expansion, same truncated-ppm
    // shares, same doubled total-variation sum
    "q230_t_closeness" ->
      """WITH d AS (
           SELECT source, n_chars // 500 AS len_bucket, lang
           FROM documents),
         g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang_g
               FROM d GROUP BY lang),
         t AS (SELECT CAST(sum(n_lang_g) AS BIGINT) AS n_total FROM g),
         cl AS (
           SELECT source, len_bucket, lang, CAST(count(*) AS BIGINT) AS n_cl
           FROM d GROUP BY 1, 2, 3),
         c AS (
           SELECT source, len_bucket, CAST(sum(n_cl) AS BIGINT) AS n_cell
           FROM cl GROUP BY 1, 2),
         x AS (
           SELECT c.source, c.len_bucket, c.n_cell, g.lang,
             abs(1000000 * COALESCE(cl.n_cl, 0) // c.n_cell
               - 1000000 * g.n_lang_g // t.n_total) AS dd
           FROM c CROSS JOIN g CROSS JOIN t
           LEFT JOIN cl ON cl.source = c.source
             AND cl.len_bucket = c.len_bucket AND cl.lang = g.lang)
         SELECT source, CAST(len_bucket AS BIGINT) AS len_bucket, n_cell,
           CAST(sum(dd) AS BIGINT) AS tv_x2_ppm,
           CAST(CASE WHEN sum(dd) > 400000 THEN 1 ELSE 0 END AS INTEGER)
             AS breach
         FROM x GROUP BY source, len_bucket, n_cell
         ORDER BY source, len_bucket""")
}
