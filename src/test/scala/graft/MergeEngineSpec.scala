package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.merge.MergeEngine

/** MergeEngine semantics (SURVEY.md §5.2.2 scenarios): no-change / update /
  * insert / null-attribute rows / re-run idempotence; SCD2 single-current
  * invariant. Timestamps are pinned so results are comparable across runs. */
class MergeEngineSpec extends SparkSuite {
  import spark.implicits._

  private val t0 = lit("2025-01-01 00:00:00").cast("timestamp")
  private val t1 = lit("2026-01-01 00:00:00").cast("timestamp")

  private def dim(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("customer_id", "name", "city")
      .withColumn("customer_skey", col("customer_id") * 10)
      .withColumn("created_date", t0)
      .withColumn("updated_date", t0)
      .withColumn("change_type", lit("I"))
      .withColumn("hash_value",
        MergeEngine.nullSafeHash(Seq(col("name"), col("city"))))

  private def src(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("customer_id", "name", "city")

  test("scd1: no-change rows untouched, changed rows updated in place, new rows inserted with durable keys") {
    val target = dim(Seq((1L, "ann", "oslo"), (2L, "bob", "rome"), (3L, "cat", "kiev")))
    val source = src(Seq((2L, "bob", "paris"), (4L, "dan", "lima")))
    val out = MergeEngine.scd1(target, source, Seq("customer_id"),
      Seq("name", "city"), "customer_skey", t1)

    val byId = out.collect().map(r => r.getAs[Long]("customer_id") -> r).toMap
    assert(out.count() == 4)
    // untouched
    assert(byId(1L).getAs[String]("change_type") == "I")
    assert(byId(1L).getAs[String]("city") == "oslo")
    // updated in place: new city, same skey, change_type U, touched updated_date
    assert(byId(2L).getAs[String]("city") == "paris")
    assert(byId(2L).getAs[Long]("customer_skey") == 20L)
    assert(byId(2L).getAs[String]("change_type") == "U")
    assert(byId(2L).getAs[java.sql.Timestamp]("updated_date").toString.startsWith("2026"))
    assert(byId(2L).getAs[java.sql.Timestamp]("created_date").toString.startsWith("2025"))
    // inserted with max(skey)+1 = 31
    assert(byId(4L).getAs[Long]("customer_skey") == 31L)
    assert(byId(4L).getAs[String]("change_type") == "I")
  }

  test("scd1: null attributes are update-able (null-safe hash fixes SURVEY §2.10.4)") {
    val target = dim(Seq((1L, null, "oslo")))
    val same = src(Seq((1L, null, "oslo")))
    val changed = src(Seq((1L, null, "bern")))
    val keep = MergeEngine.scd1(target, same, Seq("customer_id"),
      Seq("name", "city"), "customer_skey", t1).collect()(0)
    assert(keep.getAs[String]("change_type") == "I") // no false update
    val upd = MergeEngine.scd1(target, changed, Seq("customer_id"),
      Seq("name", "city"), "customer_skey", t1).collect()(0)
    assert(upd.getAs[String]("change_type") == "U") // null row still updates
    assert(upd.getAs[String]("city") == "bern")
  }

  test("scd1: re-run with the same source is a fixpoint (idempotence)") {
    val target = dim(Seq((1L, "ann", "oslo"), (2L, "bob", "rome")))
    val source = src(Seq((2L, "bob", "paris"), (4L, "dan", "lima")))
    val once = MergeEngine.scd1(target, source, Seq("customer_id"),
      Seq("name", "city"), "customer_skey", t1)
    val twice = MergeEngine.scd1(once, source, Seq("customer_id"),
      Seq("name", "city"), "customer_skey", t1)
    assert(rowsOf(once, "customer_id") == rowsOf(twice, "customer_id"))
  }

  test("upsert: matched rows updated + touched, unmatched target kept, new rows stamped") {
    val target = Seq((1L, "F", 10.0), (2L, "O", 20.0))
      .toDF("order_id", "status", "total")
      .withColumn("created_dt", t0).withColumn("updated_dt", t0)
    val source = Seq((2L, "F", 25.0), (3L, "O", 30.0))
      .toDF("order_id", "status", "total")
    val out = MergeEngine.upsert(target, source, Seq("order_id"), t1)
    val byId = out.collect().map(r => r.getAs[Long]("order_id") -> r).toMap
    assert(out.count() == 3)
    assert(byId(1L).getAs[java.sql.Timestamp]("updated_dt").toString.startsWith("2025"))
    assert(byId(2L).getAs[Double]("total") == 25.0)
    assert(byId(2L).getAs[java.sql.Timestamp]("created_dt").toString.startsWith("2025"))
    assert(byId(2L).getAs[java.sql.Timestamp]("updated_dt").toString.startsWith("2026"))
    assert(byId(3L).getAs[java.sql.Timestamp]("created_dt").toString.startsWith("2026"))
  }

  private def productDim(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("product_id", "brand")
      .withColumn("product_skey", col("product_id") * 10)
      .withColumn("hash_value", MergeEngine.nullSafeHash(Seq(col("brand"))))
      .withColumn("effective_start_date", t0)
      .withColumn("effective_end_date", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
      .withColumn("insert_date", t0)
      .withColumn("update_date", t0)

  test("scd2: changed key is expired AND re-inserted (fixes SURVEY §2.10.2); new key inserted; exactly one current row per key") {
    val target = productDim(Seq((1L, "acme"), (2L, "nova")))
    val source = Seq((2L, "nova2"), (3L, "kilo")).toDF("product_id", "brand")
    val out = MergeEngine.scd2(target, source, Seq("product_id"),
      Seq("brand"), "product_skey", t1)

    assert(out.count() == 4) // 1 kept + 1 expired + 2 new versions
    val cur = out.filter(col("is_current")).collect()
      .map(r => r.getAs[Long]("product_id") -> r.getAs[String]("brand")).toMap
    assert(cur == Map(1L -> "acme", 2L -> "nova2", 3L -> "kilo"))
    val expired = out.filter(!col("is_current")).collect()
    assert(expired.length == 1 && expired(0).getAs[Long]("product_id") == 2L)
    assert(expired(0).getAs[java.sql.Timestamp]("effective_end_date").toString.startsWith("2026"))
    // single-current invariant
    val multi = out.filter(col("is_current")).groupBy("product_id").count()
      .filter(col("count") > 1).count()
    assert(multi == 0)
  }

  test("duplicate source keys raise instead of fanning out the merge join") {
    val target = dim(Seq((1L, "ann", "oslo")))
    val dupSrc = src(Seq((1L, "ann", "oslo"), (1L, "ann", "bern")))
    val e1 = intercept[Exception] {
      MergeEngine.scd1(target, dupSrc, Seq("customer_id"),
        Seq("name", "city"), "customer_skey", t1).collect()
    }
    assert(e1.getMessage.contains("duplicate source rows"))

    val ptarget = productDim(Seq((1L, "acme")))
    val pdup = Seq((1L, "acme"), (1L, "apex")).toDF("product_id", "brand")
    val e2 = intercept[Exception] {
      MergeEngine.scd2(ptarget, pdup, Seq("product_id"),
        Seq("brand"), "product_skey", t1).collect()
    }
    assert(e2.getMessage.contains("duplicate source rows"))

    val ftarget = Seq((1L, "F", 10.0)).toDF("order_id", "status", "total")
      .withColumn("created_dt", t0).withColumn("updated_dt", t0)
    val fdup = Seq((1L, "F", 11.0), (1L, "O", 12.0))
      .toDF("order_id", "status", "total")
    val e3 = intercept[Exception] {
      MergeEngine.upsert(ftarget, fdup, Seq("order_id"), t1).collect()
    }
    assert(e3.getMessage.contains("duplicate source rows"))

    // key-unique sources still merge exactly as before
    val ok = MergeEngine.scd1(target, src(Seq((1L, "ann", "bern"))),
      Seq("customer_id"), Seq("name", "city"), "customer_skey", t1)
    assert(ok.count() == 1 && ok.collect()(0).getAs[String]("city") == "bern")
  }

  test("scd2: re-run with the same source changes nothing (hash fixpoint)") {
    val target = productDim(Seq((1L, "acme"), (2L, "nova")))
    val source = Seq((2L, "nova2"), (3L, "kilo")).toDF("product_id", "brand")
    val once = MergeEngine.scd2(target, source, Seq("product_id"),
      Seq("brand"), "product_skey", t1)
    val twice = MergeEngine.scd2(once, source, Seq("product_id"),
      Seq("brand"), "product_skey", t1)
    assert(rowsOf(once, "product_id", "product_skey") ==
           rowsOf(twice, "product_id", "product_skey"))
  }
}
