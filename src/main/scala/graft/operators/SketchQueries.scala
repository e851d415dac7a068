package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CountMinAgg

/** Sketch-audited corpus profiling — queries that run an approximate
  * sketch side-by-side with the exact aggregate it replaces at scale, and
  * FAIL (via a boolean the oracle pins to true) if the sketch's guarantee
  * is violated. The q47 approx-profile family relies on scalatest bounds
  * because its sketches are engine-specific; here the guarantee check is
  * folded into the driver-graded result itself, so the DuckDB compare
  * covers both the exact answer and the sketch contract.
  */
object SketchQueries {

  /** Token heavy hitters with a Count–Min audit: the exact top-k tokens
    * (the truth a 100 TB pipeline would approximate) plus `cms_ok` —
    * whether the sketch estimate for each token respects the CM bound
    * `exact ≤ est ≤ exact + ⌈e/width · N⌉`. The oracle expects every row
    * `true`, so a sketch regression turns the driver row red.
    *
    * Scale shape: the sketch pass is map-side combined (64 KB partials,
    * one reduce); the exact pass is the usual two-phase count. Driver
    * holds one 64 KB grid and k rows — never the token stream. */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 20)
      : DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
    val profile = toks.agg(
      CountMinAgg.countMinAgg(col("token")).as("sk"),
      count(lit(1)).as("n_total")).head()
    val sk = profile.getAs[Array[Byte]]("sk")
    val nTotal = profile.getAs[Long]("n_total")
    // 2× the textbook e/width·N bound (ADVICE r7): the single-epsilon
    // bound is only a Markov bound per probed token (Pr[violation] ≈
    // e^-depth each) — deterministic for the CURRENT fixture but a
    // regenerated fixture could legitimately exceed it with no code
    // change. Doubling the audited slack gives the pinned-true contract
    // real margin while a broken sketch (dropped partial, wrong merge)
    // still overshoots by orders of magnitude.
    val slack = 2L * math.ceil(math.E / CountMinAgg.DefaultWidth * nTotal).toLong
    val top = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(k).collect()
    val audited = top.toSeq.map { r =>
      val token = r.getString(0); val n = r.getLong(1)
      val est = CountMinAgg.estimate(sk, token)
      (token, n, est >= n && est <= n + slack)
    }
    audited.toDF("token", "n", "cms_ok")
      .orderBy(col("n").desc, col("token").asc)
  }

  /** Good–Turing missing-mass estimate per language (Good 1953): the
    * probability that the NEXT token drawn is a word never seen in the
    * corpus, estimated by `N₁/N` (hapax share). A corpus-planning
    * pipeline reads this as "how much vocabulary is this language cohort
    * still missing" — high unseen mass means more data (or a bigger
    * tokenizer vocab) is warranted; q151's head-coverage curve is the
    * other end of the same distribution. Exact integers: token count,
    * distinct vocab, hapax/doubleton counts, and `1e6·N₁ DIV N`.
    *
    * Scale shape: one explode → (lang, word) two-phase count, then a
    * map-side-combinable per-lang fold of the frequency-of-frequency
    * profile. O(langs) output. */
  def unseenMass(spark: SparkSession, dir: String): DataFrame = {
    val wc = Tables.load(spark, dir, "documents")
      .select(col("lang"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
    wc.groupBy("lang").agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("vocab"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
      sum(when(col("c") === 2, 1L).otherwise(0L)).as("doubleton"))
      .select(col("lang"), col("n_tokens"), col("vocab"), col("hapax"),
        col("doubleton"),
        expr("1000000 * hapax DIV n_tokens").as("unseen_ppm"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q181_heavy_hitters" ->
      ((s: SparkSession, d: String) => heavyHitters(s, d)),
    "q187_unseen_mass" -> (unseenMass _))

  val oracles: Map[String, String] = Map(
    // exact top-k with the same (count desc, token asc) tiebreak; cms_ok
    // is the sketch contract — constant true unless the sketch is broken
    "q181_heavy_hitters" ->
      raw"""SELECT token, CAST(count(*) AS BIGINT) AS n, true AS cms_ok
          FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
                  AS token FROM documents)
          GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""",
    // same (lang, word) fold and integer hapax share
    "q187_unseen_mass" ->
      raw"""WITH wc AS (
            SELECT lang, w, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT lang,
                    unnest(string_split_regex(trim(lower(text)), '\s+'))
                      AS w
                  FROM documents)
            GROUP BY lang, w)
          SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
            CAST(count(*) AS BIGINT) AS vocab,
            CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS hapax,
            CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
              AS doubleton,
            1000000 * CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
              AS BIGINT) // CAST(sum(c) AS BIGINT) AS unseen_ppm
          FROM wc GROUP BY lang ORDER BY lang""")
}
