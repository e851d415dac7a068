package graft

import org.apache.spark.sql.functions._

/** q47's sketch estimates are engine-specific (no DuckDB oracle), so their
  * accuracy contract is asserted here against exact values. */
class ApproxSpec extends SparkSuite {

  test("approx_count_distinct within HLL++ error bound of exact") {
    val e = Tables.loadEvents(spark, sf0001)
    val rows = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("percentile_approx brackets the exact median") {
    val e = Tables.loadEvents(spark, sf0001)
    val rows = e.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("exact_p50"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_p50"),
        expr("percentile(value, 0.4)").as("p40"),
        expr("percentile(value, 0.6)").as("p60"))
      .collect()
    rows.foreach { r =>
      val approx = r.getDouble(2)
      assert(approx >= r.getDouble(3) && approx <= r.getDouble(4),
        s"${r.getString(0)}: approx median $approx outside [p40, p60]")
    }
  }
}
