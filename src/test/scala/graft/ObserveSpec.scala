package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.quality.Expectations

/** Monitor-mode expectations ([[Expectations.observeMetrics]]): violation
  * counts ride INSIDE the query's own execution as observed metrics — on a
  * stream they surface per micro-batch through
  * `StreamingQueryProgress.observedMetrics` with no second pass, and a
  * rule that evaluates to NULL counts as a violation (the same 3VL rule
  * the drop gate applies). Also pins drop-vs-count consistency in batch
  * mode: the rows the gate removes are exactly the rows the metrics
  * count.
  */
class ObserveSpec extends SparkSuite {
  import spark.implicits._

  private case class Rec(id: Long, size: java.lang.Long)

  test("streaming observed metrics: per-batch violation counts, NULL counts as violation") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Rec]
    val observed = Expectations.observeMetrics(in.toDF(), "dq",
      Map("size_small" -> "size <= 25"))
    val q = observed.writeStream.format("memory").queryName("obs_out")
      .outputMode("append").start()
    try {
      // 4 rows: pass, violate (>25), NULL (3VL — must count), pass
      in.addData(Rec(1, 10L), Rec(2, 99L), Rec(3, null), Rec(4, 25L))
      q.processAllAvailable()
      // all rows kept — monitor mode never drops
      assert(spark.table("obs_out").count() == 4)
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("dq")))
      assert(metrics.nonEmpty, "observed metrics must surface in progress")
      val total = metrics.map(_.getAs[Long]("size_small")).sum
      val rows = metrics.map(_.getAs[Long]("rows_seen")).sum
      assert(rows == 4, s"rows_seen=$rows")
      assert(total == 2, s"violations=$total: the >25 row AND the NULL row")

      // second batch: counts accumulate per batch, not across
      in.addData(Rec(5, 1000L))
      q.processAllAvailable()
      val all = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("dq")))
      assert(all.map(_.getAs[Long]("size_small")).sum == 3)
      assert(all.map(_.getAs[Long]("rows_seen")).sum == 5)
    } finally q.stop()
  }

  test("batch drop gate and violation counts agree on NULL-evaluating rows") {
    val df = Seq[(Long, java.lang.Long)]((1, 10L), (2, 99L), (3, null))
      .toDF("id", "size")
    val rules = Map("size_small" -> "size <= 25")
    val res = Expectations.applyOrDrop(df, rules)
    assert(res.kept.count() == 1, "NULL rule result must drop the row")
    assert(res.violations == Map("size_small" -> 2L),
      "dropped rows and counted violations must be the same rows")
  }
}
