package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** OLAP surfaces NOT already covered by Relational's q16/q51/q52/q61/q63/
  * q66/q68/q69 set: subtotal lattices with `grouping()` ids over a star
  * join, the typed `Dataset.groupingSets` API (q68 exercises the SQL path
  * with legacy `grouping__id`), RANGE (value-based) window frames (q69 is
  * ROWS), the percent_rank completion of the distribution-function trio,
  * and a hash-ordered per-domain cap — the corpus-mixing quota operator.
  *
  * Scale notes: rollup/grouping-sets plan as ONE Expand + one two-phase
  * hash aggregate — the Expand multiplies rows by the number of grouping
  * sets BEFORE the shuffle, but map-side partial aggregation collapses
  * them per grouping set, so shuffled volume is O(distinct groups × sets),
  * not O(input × sets). Window queries are a single exchange on their
  * partition key; the domain cap additionally gets WindowGroupLimit
  * pushdown (per-partition top-k before the shuffle).
  */
object OlapQueries {

  private def dec(c: Column) = c.cast(DecimalType(18, 2))

  /** ROLLUP (nation, year) with `grouping()` ids over the orders star —
    * the drill-down lattice: detail rows, per-nation subtotals, grand
    * total, distinguished by gid. Dims broadcast (nation is 25 rows at
    * any SF; AQE picks broadcast for customer from measured size). */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .withColumn("o_year", year(col("o_orderdate")).cast("long"))
      .rollup(col("n_name"), col("o_year"))
      .agg(
        (grouping(col("n_name")) * lit(2) + grouping(col("o_year")))
          .cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy(col("gid"), col("n_name"), col("o_year"))
  }

  /** GROUPING SETS ((region, nation), (region), ()) through the typed
    * `Dataset.groupingSets` DataFrame API — the explicit subtotal
    * selection rollup/cube specialize, declared without SQL text. */
  def groupingSetsCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq()),
        col("r_name"), col("n_name"))
      .agg(
        (grouping(col("r_name")) * lit(2) + grouping(col("n_name")))
          .cast("long").as("gid"),
        count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("sum_acctbal"))
      .orderBy(col("gid"), col("r_name"), col("n_name"))
  }

  /** Hash-ordered per-domain cap — the per-source document quota every
    * web-corpus pipeline applies (no one source may dominate the mix).
    * Deterministic: the keep-order is a content-independent hash of the
    * id, so the SAME cap reproduces on any engine and any partitioning.
    * One window over (source); Spark's WindowGroupLimit pushes the k-limit
    * below the exchange, so each input partition ships at most k rows per
    * source — the cap gets CHEAPER as it gets more selective, and a
    * genuinely dominant domain (the skew case the cap exists to clip)
    * never funnels through a single task unclipped. */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.load(spark, dir, "documents")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select("doc_id", "source", "rk")
      .orderBy("doc_id")
  }

  /** Rolling 1-hour aggregate per user — a RANGE window frame (value-based:
    * every event sees the trailing hour INCLUDING same-timestamp peers,
    * the ANSI RANGE rule; q69's ROWS frames count physical rows instead).
    * One shuffle on user_id; the frame scan is a sliding pointer within
    * each sorted partition, O(n) regardless of frame width. */
  def rollingRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
      .rangeBetween(-3600, 0)
    Tables.loadEvents(spark, dir)
      .withColumn("epoch_s", unix_timestamp(col("ts")))
      .withColumn("n_1h", count(lit(1)).over(w).cast("long"))
      .withColumn("sum_1h",
        sum(col("value").cast(DecimalType(18, 6))).over(w)
          .cast("double"))
      .select("user_id", "epoch_s", "value", "n_1h", "sum_1h")
      .orderBy("user_id", "epoch_s", "value")
  }

  /** q137: rolling anomaly detection — each event scored against its
    * user's TRAILING one-hour window (self-exclusive: the event must not
    * vouch for itself). With n, s=Σv, s2=Σv² over the window,
    * `dev_ratio = (n·x − s)² / (n·s2 − s²)` is algebraically the squared
    * z-score (x−μ)²/σ² under population variance; the 3σ flag fires at
    * ratio > 9. Every input to the double arithmetic is an EXACT decimal
    * window sum — order-free, so the RANGE frame's evaluation order
    * can't drift the value cross-engine — and the ratio is rounded;
    * events with fewer than 2 predecessors or zero variance score
    * null/false.
    *
    * Scale: one (user)-keyed shuffle; the RANGE frame holds only the
    * trailing hour per user — the monitoring pass every event pipeline
    * runs, expressed so it shards and reproduces anywhere. */
  def rollingAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
      .rangeBetween(-3600, -1)
    val dv = col("value").cast(DecimalType(18, 6))
    val n = col("n_prev").cast("double")
    val s = col("s_prev").cast("double")
    val s2 = col("s2_prev").cast("double")
    val x = col("value")
    val num = (n * x - s) * (n * x - s)
    val varTerm = n * s2 - s * s // = n²σ²
    Tables.loadEvents(spark, dir)
      .withColumn("epoch_s", unix_timestamp(col("ts")))
      .withColumn("n_prev", count(lit(1)).over(w).cast("long"))
      .withColumn("s_prev", sum(dv).over(w))
      .withColumn("s2_prev", sum(dv * dv).over(w))
      .withColumn("dev_ratio",
        when(col("n_prev") >= 2 && varTerm > 0, round(num / varTerm, 6)))
      .withColumn("is_anomaly",
        coalesce(col("dev_ratio") > 9.0, lit(false)))
      .select(col("user_id"), col("epoch_s"), col("value"),
        col("n_prev"), col("dev_ratio"), col("is_anomaly"))
      .orderBy("user_id", "epoch_s", "value")
  }

  /** percent_rank completing q66's distribution trio (ntile/cume_dist),
    * over a tie-free ordering so ranks are engine-independent. */
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).cast(DecimalType(18, 6)).cast("double")
          .as("pct_rank"),
        cume_dist().over(w).cast(DecimalType(18, 6)).cast("double")
          .as("cdist"))
      .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
  }

  /** Fuzzy entity-matching self-join: near-identical names at edit
    * distance ≤ 1, found via BLOCKING — candidates share a 16-char name
    * prefix, so the quadratic comparison runs inside blocks only (the
    * standard entity-resolution trade: the blocking key bounds candidate
    * pairs at O(Σ block²) instead of O(N²), accepting that cross-block
    * matches are out of scope by design). The block join is a plain
    * equi-join — shuffle-hash/broadcast by size — and levenshtein runs
    * codegen'd on candidates only. */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
      .withColumn("blk", substring(col("c_name"), 1, 16))
    val a = c.select(col("blk"), col("c_custkey").as("id_a"),
      col("c_name").as("name_a"))
    val b = c.select(col("blk"), col("c_custkey").as("id_b"),
      col("c_name").as("name_b"))
    // id_a < id_b sits IN the join condition: the hash join emits half
    // the candidate pairs instead of filtering them afterwards, and
    // levenshtein (the expensive predicate) runs only on survivors.
    // Common-prefix stripping: the block equality GUARANTEES the first
    // 16 chars agree, and edit distance over strings with an identical
    // prefix equals edit distance of the remainders — so the DP runs on
    // the short suffixes (2×2 cells here vs 18×18), an exact ~80×
    // arithmetic cut per pair, not an approximation (the oracle computes
    // full-string levenshtein and must hash-match).
    a.join(b, a("blk") === b("blk") && col("id_a") < col("id_b"))
      .withColumn("dist",
        levenshtein(expr("substring(name_a, 17)"),
          expr("substring(name_b, 17)")).cast("long"))
      .filter(col("dist") <= 1)
      .select("id_a", "id_b", "dist")
      .orderBy("id_a", "id_b")
  }

  /** Statistical profile per segment — corr / normalized dispersion, the
    * stat-functions surface (corr, stddev_pop, covar_pop) a profiling pass
    * runs. All reported values are O(1) RATIOS (correlation, coefficient
    * of variation, normalized covariance): raw variances of big values
    * amplify cross-engine double-accumulation noise past any fixed
    * decimal quantum, while ratios keep it at ~1e-15 — DECIMAL(18,6)
    * rounding is then bit-stable on both engines. */
  def statSuite(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    def r6(x: Column) = x.cast(DecimalType(18, 6)).cast("double")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        r6(corr(col("c_acctbal"), col("o_totalprice"))).as("corr_bal_price"),
        r6(stddev_pop(col("o_totalprice")) / avg(col("o_totalprice")))
          .as("cv_price"),
        r6(covar_pop(col("c_acctbal"), col("o_totalprice")) /
          (avg(col("c_acctbal")) * avg(col("o_totalprice"))))
          .as("ncov_bal_price"))
      .orderBy("c_mktsegment")
  }

  /** q138: winsorization + min-max normalization per segment — the
    * outlier-clipping + scaling pass feature pipelines run before a
    * model sees a numeric column. Exact interpolated p05/p95 per segment
    * (the q63 `percentile` semantics, identical in DuckDB's
    * `quantile_cont`) computed ONCE per group and joined back (a
    * broadcast-scale aggregate — never a per-row subquery); values clip
    * to the fences and rescale to [0,1] against the clipped range. All
    * derived arithmetic runs in the same expression shape both engines,
    * rounded at the edge. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val fences = o.groupBy(col("o_custkey") % 5)
      .agg(expr("percentile(o_totalprice, 0.05)").as("p05"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
      .withColumnRenamed("(o_custkey % 5)", "seg")
    val clipped = least(greatest(col("o_totalprice"), col("p05")), col("p95"))
    o.withColumn("seg", col("o_custkey") % 5)
      .join(broadcast(fences), "seg")
      .select(col("o_orderkey"), col("seg"),
        col("o_totalprice"),
        round(clipped, 6).as("clipped"),
        round((clipped - col("p05")) /
          (col("p95") - col("p05")), 6).as("norm01"),
        (col("o_totalprice") < col("p05") ||
         col("o_totalprice") > col("p95")).as("was_clipped"))
      .orderBy("seg", "o_orderkey")
  }

  /** q241: MAD robust outlier gate — the median-absolute-deviation
    * sibling of q137's z-score (whose mean/stddev an outlier itself
    * drags) and q138's fixed-percentile fences: per language, median
    * document length, MAD = median(|x − med|), and the share of docs
    * beyond the 3·MAD fence — the robust length filter a crawl
    * pipeline runs where a few megabyte-long documents would poison a
    * mean-based gate. Exact interpolated percentiles (the q63
    * machinery, engine-parity established), three bounded hash
    * aggregates + two broadcast join-backs — nothing corpus-scaled
    * beyond the scans. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("n_chars"))
    val med = d.groupBy("lang")
      .agg(expr("percentile(n_chars, 0.5)").as("med"))
    val dev = d.join(broadcast(med), Seq("lang"))
      .withColumn("adev", abs(col("n_chars") - col("med")))
    val mad = dev.groupBy("lang")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        round(min(col("med")), 6).as("med"),
        round(min(col("mad")), 6).as("mad"),
        sum((col("adev") > col("mad") * 3).cast("long")).as("n_outliers"))
      .withColumn("outlier_ppm", expr("1000000 * n_outliers DIV n"))
      .orderBy("lang")
  }

  /** Map-typed column surface: construction (map_from_arrays), lookup
    * (element_at), higher-order rewrites (transform_values, map_filter),
    * and key introspection — exercised end-to-end with the extracted
    * scalars oracle-checked (ANSI SQL has no MAP type; the VALUES are the
    * testable contract). */
  def mapOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    val base = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_buyers"))
    base
      .withColumn("m", map_from_arrays(
        array(lit("orders"), lit("buyers")),
        array(col("n_orders"), col("n_buyers"))))
      .withColumn("m2", transform_values(col("m"),
        (_, v) => v * lit(2L)))
      .withColumn("big", map_filter(col("m"),
        (_, v) => v >= lit(10L)))
      .select(col("n_name"),
        element_at(col("m"), "orders").as("orders_via_map"),
        element_at(col("m2"), "buyers").as("buyers_doubled"),
        size(col("big")).cast("long").as("n_big_entries"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys_sorted"))
      .orderBy("n_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q123_rollup_gid" -> (rollupRevenue _),
    "q124_grouping_sets_api" -> (groupingSetsCustomers _),
    "q125_domain_cap" -> (domainCap _),
    "q126_rolling_range" -> (rollingRange _),
    "q137_rolling_anomaly" -> (rollingAnomaly _),
    "q138_winsorize" -> (winsorize _),
    "q241_mad_outliers" -> (madOutliers _),
    "q127_window_dist" -> (windowDistribution _),
    "q128_fuzzy_match" -> (fuzzyMatch _),
    "q129_stat_suite" -> (statSuite _),
    "q130_map_ops" -> (mapOps _))

  val oracles: Map[String, String] = Map(
    "q123_rollup_gid" ->
      """SELECT CAST(GROUPING(n_name)*2 + GROUPING(o_year) AS BIGINT) AS gid,
           n_name, o_year, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM (SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 o_totalprice
               FROM orders
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey)
         GROUP BY ROLLUP (n_name, o_year)
         ORDER BY gid, n_name, o_year""",
    "q124_grouping_sets_api" ->
      """SELECT CAST(GROUPING(r_name)*2 + GROUPING(n_name) AS BIGINT) AS gid,
           r_name, n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
         ORDER BY gid, r_name, n_name""",
    "q125_domain_cap" ->
      """SELECT doc_id, source, rk FROM (
           SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
           FROM documents)
         WHERE rk <= 5
         ORDER BY doc_id""",
    "q126_rolling_range" ->
      """WITH e AS (
           SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s, value
           FROM events)
         SELECT user_id, epoch_s, value,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, epoch_s, value""",
    "q137_rolling_anomaly" ->
      // same exact-decimal window sums; the double combination replays
      // Spark's expression shape term for term before the shared round
      """WITH e AS (
           SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s, value
           FROM events),
         sums AS (
           SELECT user_id, epoch_s, value,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_prev,
             SUM(CAST(value AS DECIMAL(18,6))) OVER w AS s_prev,
             SUM(CAST(value AS DECIMAL(18,6)) *
                 CAST(value AS DECIMAL(18,6))) OVER w AS s2_prev
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING)),
         scored AS (
           SELECT user_id, epoch_s, value, n_prev,
             CASE WHEN n_prev >= 2 AND
               (CAST(n_prev AS DOUBLE) * CAST(s2_prev AS DOUBLE) -
                CAST(s_prev AS DOUBLE) * CAST(s_prev AS DOUBLE)) > 0
             THEN round(
               (CAST(n_prev AS DOUBLE) * value - CAST(s_prev AS DOUBLE)) *
               (CAST(n_prev AS DOUBLE) * value - CAST(s_prev AS DOUBLE)) /
               (CAST(n_prev AS DOUBLE) * CAST(s2_prev AS DOUBLE) -
                CAST(s_prev AS DOUBLE) * CAST(s_prev AS DOUBLE)), 6)
             END AS dev_ratio
           FROM sums)
         SELECT user_id, epoch_s, value, n_prev, dev_ratio,
           coalesce(dev_ratio > 9.0, FALSE) AS is_anomaly
         FROM scored ORDER BY user_id, epoch_s, value""",
    // q241: same exact interpolated medians (quantile_cont parity per
    // q63), same 3-MAD fence and integer ppm
    "q241_mad_outliers" ->
      """WITH med AS (
           SELECT lang, quantile_cont(n_chars, 0.5) AS med
           FROM documents GROUP BY lang),
         dev AS (
           SELECT d.lang, abs(d.n_chars - med.med) AS adev, med.med
           FROM documents d JOIN med ON d.lang = med.lang),
         mad AS (
           SELECT lang, quantile_cont(adev, 0.5) AS mad
           FROM dev GROUP BY lang)
         SELECT dev.lang, CAST(count(*) AS BIGINT) AS n,
           round(min(dev.med), 6) AS med,
           round(min(mad.mad), 6) AS mad,
           CAST(sum(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers,
           CAST(1000000 * sum(CASE WHEN dev.adev > 3 * mad.mad
             THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS outlier_ppm
         FROM dev JOIN mad ON dev.lang = mad.lang
         GROUP BY dev.lang ORDER BY dev.lang""",
    "q138_winsorize" ->
      // DuckDB quantile_cont == Spark percentile (exact interpolation);
      // identical clip/rescale expression shape, rounded at the edge
      """WITH fences AS (
           SELECT o_custkey % 5 AS seg,
             quantile_cont(o_totalprice, 0.05) AS p05,
             quantile_cont(o_totalprice, 0.95) AS p95
           FROM orders GROUP BY 1)
         SELECT o_orderkey, seg, o_totalprice,
           round(least(greatest(o_totalprice, p05), p95), 6) AS clipped,
           round((least(greatest(o_totalprice, p05), p95) - p05) /
             (p95 - p05), 6) AS norm01,
           (o_totalprice < p05 OR o_totalprice > p95) AS was_clipped
         FROM orders JOIN fences ON o_custkey % 5 = seg
         ORDER BY seg, o_orderkey""",
    "q127_window_dist" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           CAST(CAST(PERCENT_RANK() OVER w AS DECIMAL(18,6)) AS DOUBLE) AS pct_rank,
           CAST(CAST(CUME_DIST() OVER w AS DECIMAL(18,6)) AS DOUBLE) AS cdist
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
         ORDER BY c_mktsegment, c_acctbal, c_custkey""",
    "q128_fuzzy_match" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
         FROM customer a
         JOIN customer b
           ON substring(a.c_name, 1, 16) = substring(b.c_name, 1, 16)
          AND a.c_custkey < b.c_custkey
         WHERE levenshtein(a.c_name, b.c_name) <= 1
         ORDER BY id_a, id_b""",
    "q129_stat_suite" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
           CAST(CAST(corr(c_acctbal, o_totalprice) AS DECIMAL(18,6)) AS DOUBLE)
             AS corr_bal_price,
           CAST(CAST(stddev_pop(o_totalprice) / avg(o_totalprice)
             AS DECIMAL(18,6)) AS DOUBLE) AS cv_price,
           CAST(CAST(covar_pop(c_acctbal, o_totalprice) /
             (avg(c_acctbal) * avg(o_totalprice)) AS DECIMAL(18,6)) AS DOUBLE)
             AS ncov_bal_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment""",
    "q130_map_ops" ->
      """WITH base AS (
           SELECT n_name, COUNT(*) AS n_orders,
             COUNT(DISTINCT o_custkey) AS n_buyers
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name)
         SELECT n_name,
           n_orders AS orders_via_map,
           n_buyers * 2 AS buyers_doubled,
           CAST((CASE WHEN n_orders >= 10 THEN 1 ELSE 0 END)
              + (CASE WHEN n_buyers >= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_big_entries,
           'buyers,orders' AS keys_sorted
         FROM base
         ORDER BY n_name""")
}
