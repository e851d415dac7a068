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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q157_k_anonymity" -> ((s: SparkSession, d: String) => kAnonymity(s, d)),
    "q218_l_diversity" ->
      ((s: SparkSession, d: String) => lDiversity(s, d)),
    "q230_t_closeness" ->
      ((s: SparkSession, d: String) => tCloseness(s, d)))

  val oracles: Map[String, String] = Map(
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
