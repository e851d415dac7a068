package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Multi-dimensional OLAP shapes the reference's BI consumers run over a
  * gold layer: ROLLUP / CUBE / GROUPING SETS subtotal lattices, PIVOT /
  * UNPIVOT reshaping, and exact (interpolated) percentiles.
  *
  * Scale notes: rollup/cube/grouping-sets plan as ONE Expand + one hash
  * aggregate — the Expand multiplies rows by the number of grouping sets
  * BEFORE the shuffle, but partial (map-side) aggregation collapses them
  * per grouping set, so the shuffled volume is O(distinct groups ×
  * sets), not O(input × sets). Pivot is a single hash aggregate whose
  * value set is declared up front (no extra distinct-collect job).
  * Exact percentiles need the full value multiset per group — fine for
  * low-cardinality BI groups; for high-cardinality profiling the sketch
  * path (q47's percentile_approx, mergeable, bounded memory) is the 100 TB
  * tool and these exact forms are its accuracy oracle.
  */
object OlapQueries {

  private def dec(c: Column) = c.cast(DecimalType(18, 2))
  private def dec4(c: Column) = c.cast(DecimalType(18, 4))

  private def ordersWithNation(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    // dims are tiny at any SF (nation = 25 rows forever) — broadcast is
    // the right physical join; AQE picks it from size estimates
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
  }

  /** ROLLUP (nation, year): the drill-down lattice — detail rows, per-nation
    * subtotals, grand total — distinguished by a grouping id. */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    ordersWithNation(spark, dir)
      .withColumn("o_year", year(col("o_orderdate")).cast("long"))
      .rollup(col("n_name"), col("o_year"))
      .agg(
        (grouping(col("n_name")) * lit(2) + grouping(col("o_year")))
          .cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy(col("gid"), col("n_name"), col("o_year"))

  /** CUBE (returnflag, linestatus): all four subtotal combinations. */
  def cubeLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * lit(2) + grouping(col("l_linestatus")))
          .cast("long").as("gid"),
        count(lit(1)).as("n_rows"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** GROUPING SETS ((region, nation), (region), ()): an explicit subtotal
    * selection — the general form rollup/cube specialize. */
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

  private val priorities = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val prioAlias = Map(
    "1-URGENT" -> "rev_urgent", "2-HIGH" -> "rev_high",
    "3-MEDIUM" -> "rev_medium", "4-NOT SPECIFIED" -> "rev_notspec",
    "5-LOW" -> "rev_low")

  /** PIVOT: revenue per nation spread across order-priority columns. The
    * value set is DECLARED (no extra distinct-scan job) so the whole thing
    * is one hash aggregate. */
  def pivotPriorities(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = ordersWithNation(spark, dir)
      .groupBy(col("n_name"))
      .pivot("o_orderpriority", priorities)
      .agg(sum(dec(col("o_totalprice"))).cast("double"))
    prioAlias.foldLeft(pivoted) { case (df, (v, a)) =>
      df.withColumnRenamed(v, a)
    }.orderBy("n_name")
  }

  /** UNPIVOT (melt): a wide per-flag aggregate back to (key, measure,
    * value) long form — the inverse reshaping, one Expand, no shuffle
    * beyond the feeding aggregate. */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("m_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("m_price"),
        sum(dec(col("l_discount"))).cast("double").as("m_disc"))
    wide.unpivot(
      Array(col("l_returnflag")),
      Array(col("m_qty"), col("m_price"), col("m_disc")),
      "measure", "value")
      .orderBy("l_returnflag", "measure")
  }

  /** Exact interpolated percentiles per group (Spark `percentile` ==
    * ANSI/DuckDB quantile_cont): the accuracy oracle for the q47 sketch
    * path. Results pass through DECIMAL(18,4) to erase cross-engine ulp
    * noise in the interpolation arithmetic. */
  def exactPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        dec4(percentile(col("l_extendedprice"), lit(0.25))).cast("double").as("p25"),
        dec4(percentile(col("l_extendedprice"), lit(0.5))).cast("double").as("p50"),
        dec4(percentile(col("l_extendedprice"), lit(0.9))).cast("double").as("p90"))
      .orderBy("l_returnflag")

  /** Hash-ordered per-domain cap — the per-source document quota every
    * web-corpus pipeline applies (no one source may dominate the mix).
    * Deterministic: the keep-order is a content-independent hash of the
    * id, so the SAME cap reproduces on any engine and any partitioning.
    * One window over (source), whose cardinality tracks the corpus, so
    * no skew funnel beyond a genuinely dominant domain — which is the
    * exact case the cap exists to clip. */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.load(spark, dir, "documents")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select("doc_id", "source", "rk")
      .orderBy("doc_id")
  }

  /** Rolling 1-hour aggregate per user — a RANGE window frame (value-based,
    * not row-based): every event sees the count/sum of the trailing hour
    * INCLUDING same-timestamp peers, exactly the ANSI RANGE rule. One
    * shuffle on user_id; the frame scan is a sliding pointer within each
    * sorted partition, O(n) per partition regardless of frame width. */
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

  /** Distribution window functions — ntile/percent_rank/cume_dist over a
    * tie-free ordering (acctbal, custkey) so ranks are engine-independent. */
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q123_rollup" -> (rollupRevenue _),
    "q124_cube" -> (cubeLineitem _),
    "q125_grouping_sets" -> (groupingSetsCustomers _),
    "q126_pivot" -> (pivotPriorities _),
    "q127_unpivot" -> (unpivotMeasures _),
    "q128_percentiles" -> (exactPercentiles _),
    "q129_domain_cap" -> (domainCap _),
    "q130_rolling_range" -> (rollingRange _),
    "q131_window_dist" -> (windowDistribution _))

  val oracles: Map[String, String] = Map(
    "q123_rollup" ->
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
    "q124_cube" ->
      """SELECT CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag, l_linestatus""",
    "q125_grouping_sets" ->
      """SELECT CAST(GROUPING(r_name)*2 + GROUPING(n_name) AS BIGINT) AS gid,
           r_name, n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
         ORDER BY gid, r_name, n_name""",
    "q126_pivot" ->
      """SELECT n_name,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
             THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
             THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_high,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
             THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_medium,
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
             THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_notspec,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
             THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_low
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name
         ORDER BY n_name""",
    "q127_unpivot" ->
      """WITH wide AS (
           SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS m_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS m_price,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS m_disc
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, measure, value FROM (
           SELECT l_returnflag, 'm_qty' AS measure, m_qty AS value FROM wide
           UNION ALL
           SELECT l_returnflag, 'm_price', m_price FROM wide
           UNION ALL
           SELECT l_returnflag, 'm_disc', m_disc FROM wide)
         ORDER BY l_returnflag, measure""",
    "q128_percentiles" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
           CAST(CAST(quantile_cont(l_extendedprice, 0.25) AS DECIMAL(18,4)) AS DOUBLE) AS p25,
           CAST(CAST(quantile_cont(l_extendedprice, 0.50) AS DECIMAL(18,4)) AS DOUBLE) AS p50,
           CAST(CAST(quantile_cont(l_extendedprice, 0.90) AS DECIMAL(18,4)) AS DOUBLE) AS p90
         FROM lineitem
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",
    "q129_domain_cap" ->
      """SELECT doc_id, source, rk FROM (
           SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
           FROM documents)
         WHERE rk <= 5
         ORDER BY doc_id""",
    "q130_rolling_range" ->
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
    "q131_window_dist" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           CAST(CAST(PERCENT_RANK() OVER w AS DECIMAL(18,6)) AS DOUBLE) AS pct_rank,
           CAST(CAST(CUME_DIST() OVER w AS DECIMAL(18,6)) AS DOUBLE) AS cdist
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
         ORDER BY c_mktsegment, c_acctbal, c_custkey""")
}
