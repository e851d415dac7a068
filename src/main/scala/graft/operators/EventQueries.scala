package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.streaming.Streams

/** Event-stream analytics over the `events` fixture: tumbling-window
  * aggregation (batch AND genuinely streaming-executed variants, both
  * oracle-checked) and gap-based sessionization via analytic windows
  * (lag + running sum — the analytic-function surface the reference's
  * ranking-only windows don't cover).
  */
object EventQueries {

  /** Tumbling hourly aggregate, batch execution. */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .orderBy("hour_start", "event_type")

  /** The same aggregate executed through Structured Streaming
    * (readStream → watermark → window → memory sink, drained with
    * Trigger.AvailableNow) — proving the streaming path produces the
    * batch-identical answer on a static source. */
  def hourlyAggStreaming(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.load(spark, dir, "events").schema
    val name = "graft_stream_hourly"
    spark.sql(s"DROP VIEW IF EXISTS $name")
    // the file streaming source wants a directory: stage the fixture file
    // into a temp dir (hardlink when possible, copy otherwise)
    val stageDir = java.nio.file.Files.createTempDirectory("graft-stream")
    val srcFile = java.nio.file.Paths.get(s"$dir/events.parquet")
    val dst = stageDir.resolve("events.parquet")
    try java.nio.file.Files.createLink(dst, srcFile)
    catch { case _: Exception => java.nio.file.Files.copy(srcFile, dst) }
    val stream = spark.readStream.schema(schema).parquet(stageDir.toString)
    // watermarks demand an LTZ event time. The fixture has shipped ts as
    // parquet TIMESTAMP(NANOS) (→ LongType under nanosAsLong) AND as
    // naive TIMESTAMP(MICROS) (→ TIMESTAMP_NTZ under Spark 4's NTZ
    // inference) — normalize either to an instant under the UTC session,
    // run the stream, and cast the window bounds back to the source's
    // type so the output stays comparable with the batch q24 oracle.
    val tsWasNtz =
      schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType
    val normalized = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        stream.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => stream
    }
    val streamed = Streams.runToMemory(Streams.hourlyCounts(normalized), name)
    val retyped = if (tsWasNtz)
      streamed.withColumn("hour_start", col("hour_start")
        .cast(org.apache.spark.sql.types.TimestampNTZType))
    else streamed
    retyped
      .withColumn("sum_value",
        col("sum_value").cast(DecimalType(18, 6)).cast("double"))
      .orderBy("hour_start", "event_type")
  }

  /** Gap-based sessionization (30-minute inactivity threshold): lag +
    * conditional running sum assigns session numbers; one row per session. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val newSession = when(
      unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(byUser)) > 1800, 1L)
      .otherwise(0L)
    Tables.loadEvents(spark, dir)
      .withColumn("is_new", newSession)
      .withColumn("session_no",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_no")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_no")
  }

  /** Spark's native session_window (merge-on-gap grouping) — the
    * declarative form of q25's lag+running-sum sessionization; the oracle
    * reuses that formulation since ANSI SQL has no session windows.
    * On a stream the same expression runs with a watermark bounding state. */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start")

  /** Approximate aggregates — the sketch surface a 100 TB profile pass
    * uses instead of exact distinct/percentile (HLL++ and KLL-style
    * sketches are mergeable across partitions, so they aggregate in one
    * map-side-combinable pass with O(sketch) memory). Engine-specific
    * sketch estimates → rows-only driver check; accuracy bounds are
    * asserted against exact values in ApproxSpec. */
  /** q47: approximate profile with a machine-checked AUDIT. The sketch
    * estimates themselves (HLL++ distinct, Greenwald–Khanna quantiles)
    * are engine-specific internals DuckDB cannot rebuild, so the query
    * emits their published CONTRACTS as booleans computed in Spark
    * against exact statistics over the same frame, pinned TRUE in the
    * oracle:
    *  - p50/p99: GK's guarantee is DETERMINISTIC — the returned value's
    *    rank is within eps·N of the target (eps = 1/accuracy = 1e-4).
    *    Audited at 2× eps plus ±1 row of absolute slack, so the pin has
    *    real margin without ever accepting a broken sketch.
    *  - distinct users: HLL++ at default rsd 0.05 — deterministic for a
    *    fixed input set (fixed hash), probabilistic across fixture
    *    regeneration. Audited at 5σ (25% relative) with an absolute
    *    floor of 16, wide enough that any plausible fixture keeps the
    *    pin true while a wrong-by-construction estimate still fails.
    * A sketch regression (wrong merge, dropped partial, rank drift)
    * flips a boolean and breaks the hash compare. */
  def approxProfile(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
    val prof = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(col("value")).as("nv"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99"))
    val exact = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    // exact rank of each approx percentile: one extra pass over events
    // against the broadcast profile (|event_type| rows — always tiny)
    val ranks = e.join(broadcast(prof), "event_type")
      .groupBy("event_type")
      .agg(
        sum(when(col("value") < col("p50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") < col("p99"), 1L).otherwise(0L)).as("lt99"),
        sum(when(col("value") <= col("p99"), 1L).otherwise(0L)).as("le99"))
    // 2× the GK eps (1/accuracy), ±1 row absolute slack
    def rankOk(lt: Column, le: Column, p: Double): Column = {
      val slack = col("nv") * lit(2.0e-4) + lit(1.0)
      (le.cast("double") >= col("nv") * lit(p) - slack) &&
        (lt.cast("double") <= col("nv") * lit(p) + slack)
    }
    prof.join(exact, "event_type").join(ranks, "event_type")
      .select(col("event_type"), col("n"),
        (abs(col("approx_users") - col("exact_users")) <=
          greatest(lit(16L), col("exact_users") / lit(4L))).as("users_ok"),
        rankOk(col("lt50"), col("le50"), 0.5).as("p50_rank_ok"),
        rankOk(col("lt99"), col("le99"), 0.99).as("p99_rank_ok"))
      .orderBy("event_type")
  }

  /** Exact distinct users per event type via the custom mergeable-bitmap
    * aggregate (one-pass, map-side partial; no Expand + distinct shuffle)
    * — oracle-checked against plain COUNT(DISTINCT). */
  def bitmapUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .groupBy("event_type")
      .agg(graft.functions.BitmapDistinct.bitmapDistinct(col("user_id"))
        .as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** As-of (point-in-time) join: each click matched to the user's most
    * recent view at-or-before it — the lookup shape behind SCD2-versioned
    * dim joins and market-data alignment, which Spark has no native
    * operator for.
    *
    * Scale shape: the naive formulation (range join + per-row max) plans a
    * quadratic range join; this one UNIONS both sides with a marker and
    * carries the reference payload forward with last_value(ignoreNulls)
    * over (key, time) — ONE shuffle + sort, linear in input, the same plan
    * shape regardless of how many clicks share a view. Views sort before
    * clicks at equal timestamps, giving ASOF's inclusive (>=) semantics. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
    // dedupe the reference side at (user, ts) so equal-timestamp picks are
    // deterministic in both engines
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("view_ts"))
      .agg(max(col("value")).as("view_value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
    val tagged = clicks
      .select(col("user_id"), col("ts"), lit(1).as("is_left"),
        col("click_value"),
        lit(null).cast("timestamp").as("view_ts"),
        lit(null).cast("double").as("view_value"))
      .unionByName(views.select(col("user_id"),
        col("view_ts").as("ts"), lit(0).as("is_left"),
        lit(null).cast("double").as("click_value"),
        col("view_ts"), col("view_value")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_left").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("asof_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
      .withColumn("asof_view_value",
        last(col("view_value"), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(col("user_id"), col("ts"), col("click_value"),
        col("asof_view_ts"), col("asof_view_value"))
      .orderBy("user_id", "ts")
  }

  /** Range (interval) join: clicks falling inside a 10-minute window after
    * each purchase — no equi key, so Spark's planner would fall back to a
    * quadratic nested-loop join.
    *
    * Scale shape: bucket time on a grid equal to the interval width; an
    * interval then overlaps ≤2 buckets, so exploding intervals to their
    * buckets and equi-joining on the bucket makes candidates per-bucket
    * products instead of |purchases|×|clicks|, with the exact range
    * predicate re-applied after (the standard interval-bucketing rewrite). */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
    val widthSec = 600L
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("p_end"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("c_ts"))
    val pb = purchases.withColumn("bucket", explode(sequence(
      floor(unix_timestamp(col("p_start")) / widthSec).cast("long"),
      floor(unix_timestamp(col("p_end")) / widthSec).cast("long"))))
    val cb = clicks.withColumn("bucket",
      floor(unix_timestamp(col("c_ts")) / widthSec).cast("long"))
    pb.join(cb, Seq("bucket"))
      .filter(col("c_ts") >= col("p_start") && col("c_ts") <= col("p_end"))
      .groupBy("purchase_id", "p_start")
      .agg(count(lit(1)).as("n_clicks_10m"))
      .orderBy("purchase_id")
  }

  /** Semi-structured extraction: JSON `props` column → typed field +
    * aggregation. get_json_object is codegen'd path extraction (Jackson
    * streaming under the hood) — at 100 TB the right move is extracting
    * ONCE into a typed silver column exactly like this, not re-parsing
    * per downstream query. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Conversion funnel view → click → purchase with STRICT event-time
    * ordering per user (a later-stage event only counts if it happens
    * after the user's first previous-stage event — the semantics product
    * analytics engines implement natively). Three per-user min
    * aggregations chained by (user_id) joins: each stage shuffles on
    * user_id once and the per-stage frames shrink monotonically; the
    * final output is a union of three single-row counts. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    def stage(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_users")).select(
        lit(name).as("stage"), col("n_users"))
    stage(views, "1_view")
      .unionByName(stage(clicks, "2_click_after_view"))
      .unionByName(stage(purchases, "3_purchase_after_click"))
      .orderBy("stage")
  }

  /** Daily retention cohorts: users grouped by first-seen date, activity
    * counted per (cohort, day offset) for the first week — the warehouse
    * dashboard query behind every "D1/D7 retention" number. Two shuffles
    * (first-seen per user, then the cohort-offset distinct count);
    * day arithmetic is exact integer days in both engines. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val first = ev.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort"))
    ev.select(col("user_id"), to_date(col("ts")).as("d"))
      .join(first, Seq("user_id"))
      .withColumn("day_offset",
        datediff(col("d"), col("cohort")).cast("long"))
      .filter(col("day_offset") <= 7)
      .groupBy("cohort", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort", "day_offset")
  }

  /** q134: time-series resample — the dense per-user hourly grid with
    * gap filling and last-observation-carried-forward (the missing-bucket
    * repair every monitoring/feature-engineering pipeline runs before a
    * model sees the series; Pandas' `resample().ffill()`, as one
    * distributed plan). Each user's observed span densifies via
    * `sequence()` — the gap generator runs INSIDE the stage, no driver
    * time loop, fan-out bounded by span hours — then a left join marks
    * gaps and an ordered running `last(ignoreNulls)` carries the latest
    * observed hourly sum forward.
    *
    * Scale: one groupBy to hourly buckets (the q24 aggregate), one
    * per-user min/max aggregate, the explode, one (user, hour)-keyed
    * join, one user-partitioned window — every shuffle is on the
    * user/hour keys with per-user width bounded by the time span, and
    * the LOCF value is a pick (no float accumulation), so the output is
    * decimal-exact cross-engine. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.loadEvents(spark, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"))
    val grid = hourly.groupBy("user_id")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("is_gap", col("n_events").isNull)
      .withColumn("locf_sum",
        round(last(col("sum_value"), ignoreNulls = true).over(w), 6))
      .select(col("user_id"), col("h").as("hour_start"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("is_gap"), col("locf_sum"))
      .orderBy("user_id", "hour_start")
  }

  /** Trailing exponentially-weighted moving average per user (α = 1/2,
    * horizon 20) — the trend-smoothing signal behind rate monitors and
    * drift alarms (q137's rolling z-score is its variance twin). EWMA's
    * recursive definition doesn't fit SQL windows, but the α=1/2
    * bounded-horizon form is EXACT as a weighted window fold: collect
    * the trailing-20 cent-quantized values and fold with bit-shift
    * weights 2^(19−lag); numerator stays under 2²⁰·max_cents (BIGINT-
    * safe), both engines truncate integer division toward zero, and the
    * 2²⁰ − 2^(20−len) denominator renormalizes short heads exactly.
    * Output is the smoothed value ×10⁸ (cents × ppm).
    *
    * Scale shape: ONE (user_id) shuffle into per-user sort; the
    * collect_list frame is bounded at 20 rows by construction and the
    * fold is O(20) per row in a single projection — no self-join, no
    * pair blow-up. */
  def ewmaSmooth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-19, Window.currentRow)
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"),
        floor(col("value") * 100).cast("long").as("v_c"))
      .withColumn("ws", collect_list(col("v_c")).over(w))
      .select(col("event_id"), col("user_id"), col("v_c"),
        size(col("ws")).cast("long").as("n_window"),
        expr("""aggregate(
            transform(ws, (v, i) ->
              v * shiftleft(CAST(1 AS BIGINT),
                CAST(20 - size(ws) + i AS INT))),
            CAST(0 AS BIGINT), (acc, x) -> acc + x)""").as("num"))
      .select(col("event_id"), col("user_id"), col("v_c"), col("n_window"),
        expr("""(1000000 * num) DIV
            (1048576 - shiftleft(CAST(1 AS BIGINT),
              CAST(20 - n_window AS INT)))""").as("ewma_e8"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_ewma" -> ((s: SparkSession, d: String) => ewmaSmooth(s, d)),
    "q134_gapfill"             -> (gapFill _),
    "q92_funnel"               -> (funnel _),
    "q93_retention"            -> (retentionCohorts _),
    "q54_asof_join"            -> (asofJoin _),
    "q55_range_join"           -> (rangeJoin _),
    "q60_json_extract"         -> (jsonExtract _),
    "q24_events_hourly"        -> (hourlyAgg _),
    "q25_events_sessionize"    -> (sessionize _),
    "q26_events_hourly_stream" -> (hourlyAggStreaming _),
    "q47_approx_profile"       -> (approxProfile _),
    "q48_session_window"       -> (sessionWindow _),
    "q53_bitmap_distinct"      -> (bitmapUsers _))

  private val hourlySql =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
       FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""

  val oracles: Map[String, String] = Map(
    // same cent quantization, same bit-shift weights over the same
    // 20-row frame; DuckDB's list window + list_zip(range) supplies the
    // 1-based index Spark's transform lambda gets for free — exponent
    // 19 − len + i matches Spark's 0-based 20 − len + i exactly
    "q153_ewma" ->
      """WITH w AS (
           SELECT event_id, user_id,
             CAST(floor(value * 100) AS BIGINT) AS v_c,
             list(CAST(floor(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS ws
           FROM events),
         n AS (
           SELECT event_id, user_id, v_c,
             CAST(len(ws) AS BIGINT) AS n_window,
             CAST(list_sum(list_transform(
               list_zip(ws, range(1, len(ws) + 1)),
               p -> p[1] * (CAST(1 AS BIGINT) <<
                 CAST(19 - len(ws) + p[2] AS INT)))) AS BIGINT) AS num
           FROM w)
         SELECT event_id, user_id, v_c, n_window,
           (1000000 * num) // (1048576 -
             (CAST(1 AS BIGINT) << CAST(20 - n_window AS INT))) AS ewma_e8
         FROM n ORDER BY event_id""",
    "q134_gapfill" ->
      // generate_series densifies each user's span (inclusive, like
      // Spark's sequence); LOCF via IGNORE NULLS running last_value
      """WITH hourly AS (
           SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           FROM events GROUP BY 1, 2),
         span AS (
           SELECT user_id, min(h) AS h0, max(h) AS h1
           FROM hourly GROUP BY user_id),
         grid AS (
           SELECT user_id,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
           FROM span)
         SELECT g.user_id, g.h AS hour_start,
           coalesce(hh.n_events, 0) AS n_events,
           hh.n_events IS NULL AS is_gap,
           round(last_value(hh.sum_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS locf_sum
         FROM grid g LEFT JOIN hourly hh
           ON hh.user_id = g.user_id AND hh.h = g.h
         ORDER BY g.user_id, hour_start""",
    // same strict-ordering chain: stage N's first event must be LATER
    // than the user's first stage-(N-1) event
    "q92_funnel" ->
      """WITH v AS (
           SELECT user_id, min(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         c AS (
           SELECT e.user_id, min(e.ts) AS t_click
           FROM events e JOIN v USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > v.t_view
           GROUP BY e.user_id),
         p AS (
           SELECT e.user_id, min(e.ts) AS t_purchase
           FROM events e JOIN c USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > c.t_click
           GROUP BY e.user_id)
         SELECT stage, n_users FROM (
           SELECT '1_view' AS stage, count(*) AS n_users FROM v
           UNION ALL
           SELECT '2_click_after_view', count(*) FROM c
           UNION ALL
           SELECT '3_purchase_after_click', count(*) FROM p)
         ORDER BY stage""",
    // first-seen date per user, integer day offsets, distinct actives
    "q93_retention" ->
      """WITH f AS (
           SELECT user_id, min(CAST(ts AS DATE)) AS cohort
           FROM events GROUP BY user_id),
         a AS (
           SELECT e.user_id, f.cohort, CAST(e.ts AS DATE) AS d
           FROM events e JOIN f USING (user_id))
         SELECT cohort, CAST(d - cohort AS BIGINT) AS day_offset,
           count(DISTINCT user_id) AS n_active
         FROM a WHERE d - cohort <= 7
         GROUP BY cohort, d - cohort ORDER BY cohort, day_offset""",
    "q24_events_hourly" -> hourlySql,
    "q26_events_hourly_stream" -> hourlySql,
    // q47: the sketch ESTIMATES are engine-specific, but their published
    // contracts are not — Spark computes the audit booleans against exact
    // statistics, the oracle pins them TRUE (plus the exact n per group).
    // Raw estimate accuracy is additionally asserted in ApproxSpec.
    "q47_approx_profile" ->
      """SELECT event_type, COUNT(*) AS n,
         TRUE AS users_ok, TRUE AS p50_rank_ok, TRUE AS p99_rank_ok
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q53_bitmap_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
         COUNT(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q54_asof_join" ->
      """WITH v AS (
           SELECT user_id, ts AS view_ts, MAX(value) AS view_value
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
         c AS (
           SELECT user_id, ts, value AS click_value
           FROM events WHERE event_type = 'click')
         SELECT c.user_id, c.ts, c.click_value,
           v.view_ts AS asof_view_ts, v.view_value AS asof_view_value
         FROM c ASOF LEFT JOIN v
           ON c.user_id = v.user_id AND c.ts >= v.view_ts
         ORDER BY c.user_id, c.ts""",
    "q60_json_extract" ->
      """SELECT event_type,
         COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
         CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
         MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q55_range_join" ->
      """SELECT p.event_id AS purchase_id, p.ts AS p_start,
         COUNT(*) AS n_clicks_10m
         FROM events p JOIN events c
           ON c.event_type = 'click' AND p.event_type = 'purchase'
           AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE
         GROUP BY p.event_id, p.ts ORDER BY purchase_id""",
    "q48_session_window" ->
      // Spark merges an event into a session iff ts < prev_ts + gap, so a
      // NEW session starts at diff >= gap — computed in integer micros
      // (epoch_us) to match Spark's microsecond timestamp comparison
      """WITH flagged AS (
           SELECT user_id, ts,
             CASE WHEN epoch_us(ts)
                    - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                  >= 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM events),
         sessions AS (
           SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sno
           FROM flagged)
         SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
         FROM sessions GROUP BY user_id, sno
         ORDER BY user_id, session_start""",
    "q25_events_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, ts,
             CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                    - CAST(FLOOR(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS is_new
           FROM events),
         sessions AS (
           SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
           FROM flagged)
         SELECT user_id, session_no, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
         FROM sessions GROUP BY user_id, session_no
         ORDER BY user_id, session_no""")
}
