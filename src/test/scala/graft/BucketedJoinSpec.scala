package graft

import org.apache.spark.sql.functions._

/** Bucketed tables co-locate join keys at WRITE time so the join needs no
  * shuffle at READ time — the other half of the 100 TB join story next to
  * broadcasting (SURVEY §4.4): repeated fact↔dim joins amortize one
  * bucketed write into zero per-query exchanges. */
class BucketedJoinSpec extends SparkSuite {

  test("join between co-bucketed tables runs without a shuffle exchange") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the test exercises the co-located path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join must consume the bucketed layout directly: no exchange on
      // either join key (the groupBy above the join keeps its own exchange)
      assert(!plan.linesIterator.exists(l => l.contains("Exchange") &&
        (l.contains("o_custkey") || l.contains("c_custkey"))),
        s"join-input shuffle present, plan:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("Bucketed: true"),
        "scan must recognize the bucketed layout")
      // sanity: same answer as the plain (non-bucketed) join
      val expected = orders.join(customer,
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(rowsOf(joined, "c_mktsegment") == rowsOf(expected, "c_mktsegment"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
