package graft

import org.apache.spark.sql.functions._

import graft.functions.BitmapDistinct.bitmapDistinct

/** The bitmap aggregate must equal exact COUNT(DISTINCT) — including
  * across partition merges (the serialize/merge path) — and reject ids
  * outside the dense domain it is designed for. */
class BitmapDistinctSpec extends SparkSuite {

  test("equals countDistinct across many partitions") {
    import spark.implicits._
    val df = spark.range(0, 10000, 1, 16)
      .select((col("id") % 7).as("g"), (col("id") % 531).as("uid"))
    val got = df.groupBy("g")
      .agg(bitmapDistinct(col("uid")).as("bm"),
        countDistinct(col("uid")).as("exact"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }

  test("nulls ignored; empty group counts zero") {
    import spark.implicits._
    val df = Seq[(String, Option[Long])](("a", Some(1L)), ("a", None),
      ("a", Some(1L)), ("b", None)).toDF("g", "uid")
    val m = df.groupBy("g").agg(bitmapDistinct(col("uid")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 1L, "b" -> 0L))
  }

  test("rejects negative ids (dense-domain contract)") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(-1L).toDF("uid").agg(bitmapDistinct(col("uid"))).collect()
    }
    assert(err.getMessage.contains("bitmap_distinct") ||
      err.getCause != null)
  }
}
