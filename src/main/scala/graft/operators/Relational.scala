package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational core: every projection/filter/join/aggregate/window/sort/scalar
  * operator from SURVEY.md §2.2–§2.7, expressed as declarative DataFrame
  * programs over the testdata tables and oracle-checked against DuckDB.
  *
  * Scale posture: every query here is shuffle-minimal by construction —
  * filters/projections sit directly over the parquet scan (Catalyst pushes
  * them into the FileScan), aggregates are two-phase hash aggregates
  * (partial map-side combine is automatic), dimension joins broadcast the
  * small side explicitly, and windows partition on their natural key.
  *
  * Numeric-determinism rule for oracle parity: any SUM/AVG over a double
  * column is computed over DECIMAL(18,2) (exact, order-independent) and cast
  * back to double, so Spark's and DuckDB's different accumulation orders
  * cannot diverge. Per-row double arithmetic (no accumulation) is IEEE-exact
  * in both engines and needs no such treatment.
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** A1-flavor pricing summary (mirrors the reference's group-count shape,
    * Silver_Customers.py:28, at lineitem scale; TPC-H Q1 family). */
  def aggPricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** P1/P4/P5-flavor: predicate + projection, pushed into the parquet scan
    * (TPC-H Q6 shape; reference filter: Silver_Customers.py:32). */
  def filterProject(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** A1/O1: group-count + sort desc (Silver_Customers.py:28 — customers per
    * email domain → here customers per market segment). */
  def domainAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(count(col("c_custkey")).as("total_customers"))
      .orderBy(desc("total_customers"), asc("c_mktsegment"))

  /** A2/P5: filtered group-count (Silver_Customers.py:32-34 — gmail-only
    * customers per state → BUILDING-segment customers per nation). */
  def filteredAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy("c_nationkey")
      .agg(count(col("c_custkey")).as("total_customers"))
      .orderBy(desc("total_customers"), asc("c_nationkey"))

  /** W1+W2+W3: the Silver-Orders flagship — dense_rank/rank/row_number over
    * (partition by year, order by total desc) (Silver_Orders.py:38-62).
    * o_orderkey added as deterministic tie-break so ranks are reproducible. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_year"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .withColumn("dense_rank_flag", dense_rank().over(w))
      .withColumn("rank_flag", rank().over(w))
      .withColumn("row_no", row_number().over(w))
      .select("o_orderkey", "o_year", "o_totalprice",
        "dense_rank_flag", "rank_flag", "row_no")
      .orderBy("o_year", "row_no")
  }

  /** W4/P6: duplicate detection via ROW_NUMBER + outer filter row_no > 1
    * (Gold_Customers.py:3-7). */
  def dupDetect(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    Tables.load(spark, dir, "lineitem")
      .withColumn("row_no", row_number().over(w))
      .filter(col("row_no") > 1)
      .select("l_orderkey", "l_linenumber", "row_no")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Top-k per group: ranking window + filter (reference's window showcase
    * composed with P6's filter-on-window shape). */
  def topKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_year"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_year", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_year", "rn")
  }

  /** J1+J2: fact ← dim left equi-joins (Gold_Orders.py:36-37). NO explicit
    * broadcast hints: orders and part scale WITH the fact in TPC-H
    * (orders = lineitem/4), so a forced broadcast is an executor OOM at
    * 100 TB, not an optimization. AQE picks broadcast when the built side
    * measures under the threshold (it does at test SFs) and falls back to
    * a shuffle join when it doesn't — which is the right behavior at every
    * scale. Explicit hints are reserved for genuinely bounded dims
    * (nation/region: 25/5 rows at any SF). */
  def factDimJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"),
        col("o_orderdate"), col("o_orderstatus"))
    val p = Tables.load(spark, dir, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    li.join(o, Seq("l_orderkey"), "left")
      .join(p, Seq("l_partkey"), "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("o_orderstatus"), year(col("o_orderdate")).as("o_year"),
        col("p_brand"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Left-anti join (the "not matched" building block of the merge rewrite,
    * SURVEY §2.3): customers with no urgent order. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Left-semi join (EXISTS — the "matched" building block of the merge
    * rewrite): customers with at least one urgent order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** F1/F2/F6/F11: scalar-function suite — split+index (email→domain shape,
    * Silver_Customers.py:23), null-safe concat_ws (fixing §2.10.4), sha2-256
    * change-detection hash (Gold_Customers.py:36-48), upper/lower
    * (Silver_Products.py:46). Doubles are hashed via DECIMAL(18,2) text so
    * both engines render identical digits. */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(
        col("c_custkey"),
        split(col("c_name"), "#").getItem(1).as("cust_num"),
        concat_ws(" ", col("c_name"), col("c_mktsegment")).as("fullname"),
        sha2(concat_ws("|",
          col("c_name"), col("c_mktsegment"),
          dec(col("c_acctbal")).cast("string")), 256).as("hash_value"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"))
      .orderBy("c_custkey")

  /** F4/F5/F9: timestamp functions — year/month/day extraction, month
    * truncation, typed null cast (Silver_Orders.py:38-43,
    * Gold_Products_No_Delta_Live.py:51). */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        lit(null).cast("timestamp").as("end_date"))
      .orderBy("o_orderkey")

  /** Conditional aggregate (the DQ violation-count shape, SURVEY §2.4):
    * sum(when(pred,1)) per group. */
  def caseAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
        sum(when(col("o_totalprice") > 200000.0, 1L).otherwise(0L)).as("n_big"))
      .orderBy("o_orderpriority")

  /** Distinct projection (dropDuplicates shape). */
  def distinctValues(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** Set ops: UNION distinct + EXCEPT (the internal building blocks of the
    * SCD2 rewrite, SURVEY §2.6). */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val big = o.filter(col("o_totalprice") > 300000.0).select("o_orderkey")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val finished = o.filter(col("o_orderstatus") === "F").select("o_orderkey")
    big.union(urgent).distinct().except(finished).orderBy("o_orderkey")
  }

  /** ROLLUP multi-level aggregate (extension past the reference's flat
    * group-bys; exercises grouping-set planning). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Multi-way join + aggregate: revenue per nation (exercises join
    * reordering + partial aggregation under AQE). Only nation — 25 rows at
    * ANY scale factor — carries a broadcast hint; customer scales with the
    * fact, so its join strategy is left to AQE's measured size. */
  def joinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
    val n = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
    li.join(o, Seq("l_orderkey"))
      .join(c, Seq("o_custkey"))
      .join(broadcast(n), Seq("c_nationkey"))
      .groupBy("n_name")
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** Pivot (wide aggregation): order totals per year split by status
    * column values. Values enumerated explicitly — at scale an un-valued
    * pivot runs a distinct-collect over the pivot column first; declaring
    * them keeps the plan a single pass. */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy("yr")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .cast("double"))
      .orderBy("yr")

  /** Unpivot/melt (wide → long): numeric part attributes to (metric, val)
    * rows — pure projection+explode under the hood, no shuffle. */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice").cast("double").as("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "metric", "val")
      .orderBy("p_partkey", "metric")

  /** TPC-H Q3 shape (shipping priority): selective dim filters pushed to
    * all three scans, two shuffle joins on the key spine, top-10 by
    * revenue — the canonical "does the optimizer do its job" query.
    * Revenue through DECIMAL for exact cross-engine totals. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1995-03-15").cast("timestamp")
    val c = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("o_custkey"))
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    // customer scales with SF — no broadcast hint; the BUILDING-segment
    // filter makes it small enough that AQE broadcasts it when measured.
    li.join(o, Seq("l_orderkey")).join(c, Seq("o_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 6))).cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderdate"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape (local-supplier revenue): the classic join-ORDER
    * benchmark — six tables, where the only join between the customer and
    * supplier spines is the non-key `c_nationkey = s_nationkey` residual.
    * Declared smallest-first so Catalyst keeps the cheap dimension
    * reductions (region→nation→supplier, explicitly broadcast — ≤ a few
    * hundred rows at any SF once the region filter lands) ahead of the two
    * fact shuffles. lineitem⋈orders⋈customer shuffles on the key spine;
    * the supplier probe then carries BOTH `l_suppkey = s_suppkey` and the
    * nation residual as one hash-join condition, so no row explosion ever
    * materializes. Selective date filter pushed to the orders scan. */
  def localSupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables.load(spark, dir, "nation")
      .join(broadcast(Tables.load(spark, dir, "region")
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val s = Tables.load(spark, dir, "supplier")
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 6))).cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** TPC-H Q10 shape (returned-item reporting): one quarter of orders,
    * only returned lineitems, revenue attributed per customer — the
    * "which customers are hurting us" dashboard query. Both selective
    * filters are pushed to their scans BEFORE the key-spine joins, the
    * nation name arrives by broadcast, and the top-20 is a
    * TakeOrderedAndProject (never a global sort materialization). */
  def returnedItemReport(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-10-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val n = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 6))).cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q18 shape (large-volume orders). The textbook SQL re-aggregates
    * lineitem twice (a HAVING subquery feeding an outer GROUP BY); the
    * Spark-first plan aggregates ONCE — per-order quantity totals, filter
    * > 180, then enrich the surviving handful with orders+customer. At
    * 100 TB that halves the big-fact shuffle; the post-filter side is tiny
    * so AQE broadcasts it into the orders probe. */
  def largeVolumeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.load(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > 180)
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice").cast("double").as("o_totalprice"))
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
    o.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderdate"), asc("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the doubly-
    * correlated EXISTS / NOT EXISTS pair — the classic subquery-decorrelation
    * stress test. The textbook SQL probes lineitem three times (l1 + an
    * EXISTS semi self-join + a NOT EXISTS anti self-join); here both
    * correlations collapse into ONE per-order aggregate —
    * `distinct suppliers` and `distinct LATE suppliers` — joined back on
    * the order key (a row is a "lonely late supplier" iff it is late,
    * the order has ≥2 suppliers, and exactly 1 late one). At 100 TB that
    * replaces two fact-fact semi/anti shuffles with one groupBy + one
    * co-keyed join. "Late" = shipped >100 days after order date (this
    * schema carries no commit/receipt dates). Supplier lookup is left to
    * AQE — supplier scales with SF, so no forced broadcast. */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAYS"))
    val perOrder = li.groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .select("l_orderkey")
    val s = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
    li.filter(col("late"))
      .join(perOrder, Seq("l_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(20)
  }

  /** TPC-H Q13 shape (customer order-count distribution): the outer-join
    * aggregate — the filter lives in the JOIN CONDITION, not a WHERE
    * (a WHERE would turn the outer join inner and silently drop
    * zero-order customers, the classic Q13 trap), followed by a second
    * aggregation over the first's output. count(o_orderkey) counts
    * non-null matches only, so customers with no qualifying orders land
    * in the c_count=0 bucket. Two shuffles total: the join/groupBy on
    * c_custkey (co-keyed — one exchange feeds both) and the tiny
    * distribution re-group. */
  def custOrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer").select(col("c_custkey"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    val perCust = c.join(o,
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** TPC-H Q22 shape (global-benchmark anti join): an UNCORRELATED scalar
    * subquery (the positive-balance average — one number, planned as a
    * subquery broadcast, complementing q64's correlated form) gates the
    * probe side, then a LEFT ANTI join removes customers with any urgent
    * order. The anti join shuffles on the customer key with the filter
    * pushed to the orders scan; no EXISTS decorrelation machinery needed —
    * anti join IS the decorrelated form. (The fixture's every customer
    * has orders, so the textbook "no orders at all" predicate is
    * sharpened to "no URGENT orders".) */
  def globalBenchmarkAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    // exact-sum-then-one-division, not avg(): a double avg's partial
    // aggregation is accumulation-order dependent — a balance within ulps
    // of the threshold could flip across partitionings/engines
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") /
        count(lit(1))).as("a"))
    val urgent = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("a"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** CUBE over (status, priority): all four grouping combinations in one
    * pass (Expand + single hash-agg — not four scans). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  /** Ordered array aggregation: per-nation sorted top-customer list,
    * rendered as a string (collect_list order is partition-dependent, so
    * determinism requires the explicit sort_array; rendering as a joined
    * string keeps the oracle comparison format-stable). */
  def arrayAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .groupBy("c_nationkey")
      .agg(array_join(sort_array(collect_list(col("c_custkey"))), ",")
        .as("top_customers"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey")

  /** Exact interpolated percentiles (Spark `percentile` and DuckDB
    * `quantile_cont` share the (n−1)·p linear-interpolation definition;
    * round(6) absorbs last-ulp differences). */
  def exactMedian(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Explicit window frames: a centered 3-row moving sum, the partition's
    * first value, and the 2nd value in the running frame — the
    * rowsBetween surface the reference's ranking windows never touch. */
  def windowFrames(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .filter(col("o_custkey") < 50)
      .withColumn("moving3",
        sum(dec(col("o_totalprice"))).over(w.rowsBetween(-1, 1))
          .cast("double"))
      .withColumn("first_price",
        first(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("second_price",
        nth_value(col("o_totalprice"), 2)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("o_custkey", "o_orderkey", "o_totalprice", "moving3",
        "first_price", "second_price")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Explicit GROUPING SETS (neither rollup's prefix chain nor cube's full
    * lattice — exactly the requested combinations) + grouping_id to tell
    * the aggregation levels apart; one Expand + one hash-agg pass. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
         grouping__id AS gid, COUNT(*) AS cnt
         FROM orders_v
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
  }

  /** Date arithmetic beyond q12's extraction functions: day differences,
    * offsets, month-end, quarter, day-of-week (Spark's 1=Sunday convention
    * aligned explicitly in the oracle), month offset with end-clamping. */
  def dateArithmetic(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .withColumn("od", col("o_orderdate").cast("date"))
      .select(
        col("o_orderkey"),
        datediff(lit("1998-12-31").cast("date"), col("od")).as("days_to_eoy"),
        date_add(col("od"), 30).as("due_date"),
        last_day(col("od")).as("month_end"),
        quarter(col("od")).as("qtr"),
        dayofweek(col("od")).as("dow"),
        add_months(col("od"), 3).as("plus_quarter"))
      .orderBy("o_orderkey")

  /** Analytic window functions beyond the reference's ranking trio:
    * lag/lead (offset), ntile (bucketing), cume_dist (distribution),
    * and a running frame sum — one Window spec, one shuffle+sort. */
  def analyticWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"),
      col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .filter(col("o_custkey") < 100)
      .withColumn("prev_total", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_total", lead(col("o_totalprice"), 1).over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .withColumn("running_spend",
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .select("o_custkey", "o_orderkey", "o_totalprice", "prev_total",
        "next_total", "quartile", "cume", "running_spend")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** SQL entry path with a correlated scalar subquery (decorrelated by
    * Catalyst into a join-aggregate — same plan the DataFrame formulation
    * would produce; the point is the SQL surface parity). */
  def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
         FROM customer_v o
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v i
                            WHERE i.c_nationkey = o.c_nationkey) * 1.5
         ORDER BY c_custkey""")
  }

  /** Extended string-function suite: regexp_extract, lpad, translate,
    * levenshtein, initcap-ish casing — all codegen'd builtins with exact
    * cross-engine semantics. */
  def stringSuite(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        lpad(col("p_partkey").cast("string"), 10, "0").as("padded_key"),
        translate(col("p_brand"), "#", "-").as("brand_dashed"),
        levenshtein(col("p_brand"), lit("Brand-00")).as("brand_dist"),
        length(col("p_name")).as("name_len"))
      .orderBy("p_partkey")

  /** Fixed-bin histogram of order totals — the EXACT data-profiling
    * primitive complementing q47's sketches (KLL gives approximate
    * quantiles; a fixed-edge histogram is the audit chart a curation
    * dashboard draws). Bin index is one clamped floor-divide on constant
    * edges — fully codegen'd map side, then a two-phase count; per-bin
    * min/max document the clamping at the edge bins. */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val width = 30000.0
    val bucket = least(greatest(
      floor(col("o_totalprice") / width), lit(0.0)), lit(19.0)).cast("long")
    Tables.load(spark, dir, "orders")
      .select(bucket.as("bucket"), col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_total"),
        max(col("o_totalprice")).as("max_total"))
      .withColumn("bin_lo", col("bucket").cast("double") * width)
      .select("bucket", "bin_lo", "n_orders", "min_total", "max_total")
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q91_histogram"      -> (histogram _),
    "q56_tpch_q3"        -> (shippingPriority _),
    "q94_tpch_q5"        -> (localSupplierRevenue _),
    "q95_tpch_q10"       -> (returnedItemReport _),
    "q96_tpch_q18"       -> (largeVolumeOrders _),
    "q101_tpch_q21"      -> (waitingSuppliers _),
    "q103_tpch_q13"      -> (custOrderDistribution _),
    "q104_tpch_q22"      -> (globalBenchmarkAnti _),
    "q61_cube"           -> (cubeAgg _),
    "q62_array_agg"      -> (arrayAgg _),
    "q63_exact_median"   -> (exactMedian _),
    "q64_corr_subquery"  -> (correlatedSubquery _),
    "q65_string_suite"   -> (stringSuite _),
    "q66_analytic_windows" -> (analyticWindows _),
    "q67_date_arith"     -> (dateArithmetic _),
    "q68_grouping_sets"  -> (groupingSets _),
    "q69_window_frames"  -> (windowFrames _),
    "q51_pivot"          -> (pivotAgg _),
    "q52_unpivot"        -> (unpivotMetrics _),
    "q01_agg_pricing"    -> (aggPricing _),
    "q02_filter_project" -> (filterProject _),
    "q03_domain_agg"     -> (domainAgg _),
    "q04_filtered_agg"   -> (filteredAgg _),
    "q05_window_rank"    -> (windowRank _),
    "q06_dup_detect"     -> (dupDetect _),
    "q07_topk_per_group" -> (topKPerGroup _),
    "q08_fact_dim_join"  -> (factDimJoin _),
    "q09_anti_join"      -> (antiJoin _),
    "q10_semi_join"      -> (semiJoin _),
    "q11_scalar_funcs"   -> (scalarFuncs _),
    "q12_date_funcs"     -> (dateFuncs _),
    "q13_case_agg"       -> (caseAgg _),
    "q14_distinct"       -> (distinctValues _),
    "q15_set_ops"        -> (setOps _),
    "q16_rollup"         -> (rollupAgg _),
    "q17_join_agg"       -> (joinAgg _))

  val oracles: Map[String, String] = Map(
    // same constant edges, same clamped floor-divide (IEEE double division
    // is engine-identical), same per-bin bounds
    "q91_histogram" ->
      """WITH b AS (
           SELECT CAST(least(greatest(floor(o_totalprice / 30000.0), 0.0),
                    19.0) AS BIGINT) AS bucket,
                  o_totalprice
           FROM orders)
         SELECT bucket, CAST(bucket AS DOUBLE) * 30000.0 AS bin_lo,
           count(*) AS n_orders,
           min(o_totalprice) AS min_total,
           max(o_totalprice) AS max_total
         FROM b GROUP BY bucket ORDER BY bucket""",
    "q69_window_frames" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS moving3,
         first_value(o_totalprice) OVER w AS first_price,
         nth_value(o_totalprice, 2) OVER w AS second_price
         FROM orders WHERE o_custkey < 50
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",
    "q68_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
           AS BIGINT) AS gid,
         COUNT(*) AS cnt
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q67_date_arith" ->
      """SELECT o_orderkey,
         datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
           AS days_to_eoy,
         CAST(o_orderdate AS DATE) + 30 AS due_date,
         last_day(CAST(o_orderdate AS DATE)) AS month_end,
         quarter(CAST(o_orderdate AS DATE)) AS qtr,
         CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS dow,
         CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
           AS plus_quarter
         FROM orders ORDER BY o_orderkey""",
    "q66_analytic_windows" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
         lag(o_totalprice, 1) OVER w AS prev_total,
         lead(o_totalprice, 1) OVER w AS next_total,
         ntile(4) OVER w AS quartile,
         round(cume_dist() OVER w, 6) AS cume,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
         FROM orders WHERE o_custkey < 100
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "q64_corr_subquery" ->
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
         FROM customer o
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                            WHERE i.c_nationkey = o.c_nationkey) * 1.5
         ORDER BY c_custkey""",
    "q65_string_suite" ->
      """SELECT p_partkey,
         coalesce(regexp_extract(p_name, '^(\w+)', 1), '') AS first_word,
         lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
         replace(p_brand, '#', '-') AS brand_dashed,
         levenshtein(p_brand, 'Brand-00') AS brand_dist,
         length(p_name) AS name_len
         FROM part ORDER BY p_partkey""",
    "q62_array_agg" ->
      """SELECT c_nationkey,
         array_to_string(list_sort(list(c_custkey)), ',') AS top_customers,
         COUNT(*) AS n
         FROM customer WHERE c_acctbal > 9000
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q63_exact_median" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
         round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q61_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q56_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS DOUBLE) AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""",
    "q94_tpch_q5" ->
      """SELECT n_name,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS DOUBLE) AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1997-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q95_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS DOUBLE) AS revenue
         FROM customer, orders, lineitem, nation
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND o_orderdate >= TIMESTAMP '1996-07-01'
           AND o_orderdate <  TIMESTAMP '1996-10-01'
           AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q96_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM customer, orders, lineitem
         WHERE o_orderkey IN (
             SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
             HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180)
           AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""",
    "q101_tpch_q21" ->
      // the textbook doubly-correlated form — DuckDB decorrelates it its
      // own way; agreement proves the one-aggregate reformulation
      """SELECT s_name, count(*) AS numwait
         FROM supplier, lineitem l1, orders
         WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
           AND o_orderstatus = 'F'
           AND l1.l_shipdate > o_orderdate + INTERVAL 100 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                       WHERE l3.l_orderkey = l1.l_orderkey
                         AND l3.l_suppkey <> l1.l_suppkey
                         AND l3.l_shipdate > o_orderdate + INTERVAL 100 DAY)
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
    "q104_tpch_q22" ->
      """SELECT c_mktsegment, count(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
         FROM customer
         WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                     AS DOUBLE) / count(*)
                            FROM customer WHERE c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q103_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c_custkey, count(o_orderkey) AS c_count
               FROM customer LEFT OUTER JOIN orders
                 ON c_custkey = o_custkey
                   AND o_orderpriority <> '1-URGENT'
               GROUP BY c_custkey) c_orders
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "q51_pivot" ->
      """SELECT year(o_orderdate) AS yr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS F,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS O,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS P
         FROM orders GROUP BY yr ORDER BY yr""",
    "q52_unpivot" ->
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
         FROM part
         UNION ALL
         SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE)
         FROM part
         ORDER BY p_partkey, metric""",
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
           AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
         ORDER BY l_orderkey, l_linenumber""",
    "q03_domain_agg" ->
      """SELECT c_mktsegment, COUNT(c_custkey) AS total_customers
         FROM customer GROUP BY c_mktsegment
         ORDER BY total_customers DESC, c_mktsegment ASC""",
    "q04_filtered_agg" ->
      """SELECT c_nationkey, COUNT(c_custkey) AS total_customers
         FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey
         ORDER BY total_customers DESC, c_nationkey ASC""",
    "q05_window_rank" ->
      """SELECT o_orderkey, year(o_orderdate) AS o_year, o_totalprice,
         DENSE_RANK() OVER w AS dense_rank_flag,
         RANK() OVER w AS rank_flag,
         ROW_NUMBER() OVER w AS row_no
         FROM orders
         WINDOW w AS (PARTITION BY year(o_orderdate)
                      ORDER BY o_totalprice DESC, o_orderkey ASC)
         ORDER BY o_year, row_no""",
    "q06_dup_detect" ->
      """SELECT l_orderkey, l_linenumber, row_no FROM (
           SELECT l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS row_no
           FROM lineitem) t
         WHERE row_no > 1
         ORDER BY l_orderkey, l_linenumber""",
    "q07_topk_per_group" ->
      """SELECT o_year, rn, o_orderkey, o_totalprice FROM (
           SELECT year(o_orderdate) AS o_year, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY year(o_orderdate)
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) t
         WHERE rn <= 3
         ORDER BY o_year, rn""",
    "q08_fact_dim_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_orderstatus,
         year(o_orderdate) AS o_year, p_brand
         FROM lineitem
         LEFT JOIN orders ON l_orderkey = o_orderkey
         LEFT JOIN part ON l_partkey = p_partkey
         ORDER BY l_orderkey, l_linenumber""",
    "q09_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q10_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q11_scalar_funcs" ->
      """SELECT c_custkey,
         string_split(c_name, '#')[2] AS cust_num,
         concat_ws(' ', c_name, c_mktsegment) AS fullname,
         sha256(concat_ws('|', c_name, c_mktsegment,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR))) AS hash_value,
         upper(c_mktsegment) AS seg_upper,
         lower(c_name) AS name_lower
         FROM customer ORDER BY c_custkey""",
    "q12_date_funcs" ->
      """SELECT o_orderkey,
         year(o_orderdate) AS o_year,
         month(o_orderdate) AS o_month,
         day(o_orderdate) AS o_day,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
         CAST(NULL AS TIMESTAMP) AS end_date
         FROM orders ORDER BY o_orderkey""",
    "q13_case_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
         CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q14_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q15_set_ops" ->
      """(SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0
         UNION
         SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        EXCEPT
        SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        ORDER BY o_orderkey""",
    "q16_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q17_join_agg" ->
      """SELECT n_name,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_lines
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY revenue DESC, n_name ASC""")
}
