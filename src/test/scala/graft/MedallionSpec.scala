package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.pipeline.Medallion

/** End-to-end medallion pipeline over reference-shaped entities
  * (FIXTURES.md §2): two consecutive loads exercise initial create, SCD1
  * in-place update with stable keys, SCD2 versioning, fact upsert, and the
  * DQ gate. */
class MedallionSpec extends SparkSuite {
  import spark.implicits._

  private val t1 = lit("2026-01-01 00:00:00").cast("timestamp")
  private val t2 = lit("2026-02-01 00:00:00").cast("timestamp")

  private def customers(rows: Seq[(Long, String, String, String, String, String)]): DataFrame =
    rows.toDF("customer_id", "first_name", "last_name", "email", "city", "state")
      .withColumn("_rescued_data", lit(null).cast("string"))

  private def orders(rows: Seq[(Long, String, Long, Long, Long, Double)]): DataFrame =
    rows.toDF("order_id", "order_date", "customer_id", "product_id",
      "quantity", "total_amount")
      .withColumn("_rescued_data", lit(null).cast("string"))

  private def products(rows: Seq[(Long, String, String, Double, String, String)]): DataFrame =
    rows.toDF("product_id", "product_name", "category", "price", "brand", "supplier")
      .withColumn("_rescued_data", lit(null).cast("string"))

  private def regions(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("region_id", "region_name")
      .withColumn("_rescued_data", lit(null).cast("string"))

  test("two-run medallion: silver enrichment, SCD1/SCD2/upsert gold, DQ gate") {
    val cat = new Catalog(spark, tmpDir("graft-medallion"))
    val m = new Medallion(spark, cat)

    m.run(
      customers(Seq(
        (1L, "Ann", "Ash", "ann@gmail.com", "Oslo", "NO"),
        (2L, "Bob", "Bix", "bob@yahoo.com", "Rome", "IT"))),
      orders(Seq(
        (10L, "2026-01-05", 1L, 100L, 2L, 50.0),
        (11L, "2026-01-06", 2L, 101L, 1L, 70.0))),
      products(Seq(
        (100L, "Widget", "tools", 10.0, "acme", "s1"),
        (101L, "Gadget", "toys", 20.0, "nova", "s2"))),
      regions(Seq((1L, "Europe"))),
      t1)

    // silver enrichment
    val sc = cat.read("silver", "customers")
    assert(sc.filter(col("customer_id") === 1).select("domains")
      .as[String].collect()(0) == "gmail.com")
    assert(sc.filter(col("customer_id") === 1).select("fullname")
      .as[String].collect()(0) == "Ann Ash")
    assert(!sc.columns.contains("_rescued_data"))
    // silver products: UDF surface applied
    val sp = cat.read("silver", "products")
    assert(sp.filter(col("product_id") === 100).select("discounted_price")
      .as[Double].collect()(0) == 9.0)
    assert(sp.filter(col("product_id") === 100).select("brand")
      .as[String].collect()(0) == "ACME")
    // initial gold
    assert(cat.read("gold", "customer_dim").count() == 2)
    assert(cat.read("gold", "order_fact").count() == 2)

    // run 2: Ann moves city (SCD1 update), product 100 rebrands (SCD2
    // version), order 10 amount changes + order 12 arrives (upsert),
    // plus a NULL-keyed order the DQ gate must drop.
    m.run(
      customers(Seq(
        (1L, "Ann", "Ash", "ann@gmail.com", "Bergen", "NO"),
        (2L, "Bob", "Bix", "bob@yahoo.com", "Rome", "IT"),
        (3L, "Cat", "Cox", "cat@gmail.com", "Kiev", "UA"))),
      orders(Seq(
        (10L, "2026-01-05", 1L, 100L, 2L, 55.0),
        (11L, "2026-01-06", 2L, 101L, 1L, 70.0),
        (12L, "2026-02-01", 3L, 100L, 5L, 99.0))).union(
        Seq((null.asInstanceOf[java.lang.Long], "2026-02-01", 1L, 100L, 1L, 1.0))
          .toDF("order_id", "order_date", "customer_id", "product_id",
            "quantity", "total_amount")
          .withColumn("_rescued_data", lit(null).cast("string"))
          .select("order_id", "order_date", "customer_id", "product_id",
            "quantity", "total_amount", "_rescued_data")),
      products(Seq(
        (100L, "Widget", "tools", 10.0, "acme2", "s1"),
        (101L, "Gadget", "toys", 20.0, "nova", "s2"))),
      regions(Seq((1L, "Europe"))),
      t2)

    // SCD1: in-place city update, stable skey, change_type U
    val dimC = cat.read("gold", "customer_dim")
    assert(dimC.count() == 3)
    val ann = dimC.filter(col("customer_id") === 1).collect()(0)
    assert(ann.getAs[String]("city") == "Bergen")
    assert(ann.getAs[String]("change_type") == "U")
    assert(ann.getAs[Long]("customer_skey") == 1L) // initial-load key kept
    val bob = dimC.filter(col("customer_id") === 2).collect()(0)
    assert(bob.getAs[String]("change_type") == "I") // untouched

    // SCD2: two versions of product 100, exactly one current
    val dimP = cat.read("gold", "product_dim")
    assert(dimP.filter(col("product_id") === 100).count() == 2)
    val curP = dimP.filter(col("product_id") === 100 && col("is_current")).collect()
    assert(curP.length == 1 && curP(0).getAs[String]("brand") == "ACME2")
    assert(dimP.filter(col("product_id") === 101).count() == 1)

    // fact upsert: amount updated in place, new order inserted, null dropped
    val fact = cat.read("gold", "order_fact")
    assert(fact.count() == 3) // 10, 11, 12 — the null-keyed row was dropped
    assert(fact.filter(col("order_id") === 10).select("total_amount")
      .as[Double].collect()(0) == 55.0)
    assert(fact.filter(col("order_id") === 10)
      .select("updated_dt").collect()(0).getTimestamp(0).toString.startsWith("2026-02"))
    assert(fact.filter(col("order_id") === 11)
      .select("updated_dt").collect()(0).getTimestamp(0).toString.startsWith("2026-02"))
    // fact rows carry the dim surrogate keys (the REAL product_skey)
    assert(fact.filter(col("order_id") === 12).select("product_skey")
      .collect()(0).getLong(0) > 0)
  }

  test("bucketed gold (dimBuckets) produces identical results to the full-snapshot path") {
    def runBoth(buckets: Option[Int]): (Catalog, Medallion) = {
      val cat = new Catalog(spark, tmpDir("graft-medallion-b"))
      val m = new Medallion(spark, cat, buckets)
      def load(t: org.apache.spark.sql.Column,
          custCity: String, extra: Boolean): Unit =
        m.run(
          customers(Seq(
            (1L, "Ann", "Ash", "ann@gmail.com", custCity, "NO"),
            (2L, "Bob", "Bix", "bob@yahoo.com", "Rome", "IT")) ++
            (if (extra) Seq((3L, "Cat", "Cox", "cat@gmail.com", "Kiev", "UA")) else Nil)),
          orders(Seq(
            (10L, "2026-01-05", 1L, 100L, 2L, if (extra) 55.0 else 50.0),
            (11L, "2026-01-06", 2L, 101L, 1L, 70.0)) ++
            (if (extra) Seq((12L, "2026-02-01", 3L, 100L, 5L, 99.0)) else Nil)),
          products(Seq(
            (100L, "Widget", "tools", 10.0, if (extra) "acme2" else "acme", "s1"),
            (101L, "Gadget", "toys", 20.0, "nova", "s2"))),
          regions(Seq((1L, "Europe"))),
          t)
      load(t1, "Oslo", extra = false)
      load(t2, "Bergen", extra = true)
      (cat, m)
    }
    val (catPlain, _) = runBoth(None)
    val (catBuck, _) = runBoth(Some(4))
    for (table <- Seq("customer_dim", "product_dim", "order_fact")) {
      val plain = catPlain.read("gold", table)
      val cols = plain.columns.toSeq.sorted
      val buck = graft.merge.PartitionedMerge.read(spark,
        catBuck.path("gold", table))
      assert(rowsOf(plain.select(cols.map(col): _*), cols: _*) ==
        rowsOf(buck.select(cols.map(col): _*), cols: _*),
        s"bucketed gold.$table diverged from the full-snapshot path")
    }
  }

  test("declarative graph run produces tables identical to the imperative run") {
    def runTwice(declarative: Boolean): Catalog = {
      val cat = new Catalog(spark, tmpDir("graft-medallion-dlt"))
      val m = new Medallion(spark, cat)
      def load(t: org.apache.spark.sql.Column, custCity: String,
          extra: Boolean): Unit = {
        val bc = customers(Seq(
          (1L, "Ann", "Ash", "ann@gmail.com", custCity, "NO"),
          (2L, "Bob", "Bix", "bob@yahoo.com", "Rome", "IT")) ++
          (if (extra) Seq((3L, "Cat", "Cox", "cat@gmail.com", "Kiev", "UA")) else Nil))
        val bo = orders(Seq(
          (10L, "2026-01-05", 1L, 100L, 2L, if (extra) 55.0 else 50.0),
          (11L, "2026-01-06", 2L, 101L, 1L, 70.0)) ++
          (if (extra) Seq((12L, "2026-02-01", 3L, 100L, 5L, 99.0),
            (13L, "2026-02-02", 1L, 101L, 1L, -5.0)) else Nil)) // DQ-dropped
        val bp = products(Seq(
          (100L, "Widget", "tools", 10.0, if (extra) "acme2" else "acme", "s1"),
          (101L, "Gadget", "toys", 20.0, "nova", "s2")))
        val br = regions(Seq((1L, "Europe")))
        if (declarative) m.runDeclarative(bc, bo, bp, br, t)
        else m.run(bc, bo, bp, br, t)
      }
      load(t1, "Oslo", extra = false)
      load(t2, "Bergen", extra = true)
      cat
    }
    val imp = runTwice(declarative = false)
    val dec = runTwice(declarative = true)
    for (table <- Seq("silver/customers", "silver/orders", "silver/products",
        "silver/regions", "gold/customer_dim", "gold/product_dim",
        "gold/order_fact")) {
      val Array(layer, name) = table.split('/')
      val a = imp.read(layer, name)
      val cols = a.columns.toSeq.sorted
      val b = dec.read(layer, name)
      assert(b.columns.toSeq.sorted == cols,
        s"$table schema diverged: ${b.columns.toSeq.sorted} vs $cols")
      assert(rowsOf(a.select(cols.map(col): _*), cols: _*) ==
        rowsOf(b.select(cols.map(col): _*), cols: _*),
        s"declarative $table diverged from the imperative run")
    }
    // the DQ gate reported the dropped fact row
    val m2 = new Medallion(spark, dec)
    val res = m2.runDeclarative(
      customers(Seq((1L, "Ann", "Ash", "ann@gmail.com", "Bergen", "NO"))),
      orders(Seq((14L, "2026-03-01", 1L, 100L, 1L, -1.0))),
      products(Seq((100L, "Widget", "tools", 10.0, "acme2", "s1"))),
      regions(Seq((1L, "Europe"))), t2)
    assert(res.violations("gold.order_fact")("amount_non_negative") == 1L)
    // execution order respected dependencies
    val pos = res.order.zipWithIndex.toMap
    assert(pos("silver.customers") < pos("gold.customer_dim"))
    assert(pos("gold.customer_dim") < pos("gold.order_fact"))
    assert(pos("gold.product_dim") < pos("gold.order_fact"))
    // each declarative run published a pipeline epoch (runs above: 2 in
    // runTwice + this one), and epoch reads serve the same gold tables
    assert(res.epoch.contains(3))
    val viaEpoch = graft.pipeline.PipelineEpoch
      .read(spark, dec, "medallion", "gold.order_fact")
    assert(rowsOf(viaEpoch, "order_id") ==
      rowsOf(dec.read("gold", "order_fact"), "order_id"))
  }

  test("pipeline graph rejects cycles, unknown inputs, and undeclared reads") {
    import graft.pipeline.PipelineGraph
    val cat = new Catalog(spark, tmpDir("graft-graph-err"))
    // cycle: a -> b -> a
    val cyclic = new PipelineGraph(spark, cat)
      .view("a", inputs = Seq("b"))(r => r("b"))
      .view("b", inputs = Seq("a"))(r => r("a"))
    val ex = intercept[IllegalStateException] { cyclic.run() }
    assert(ex.getMessage.contains("cycle"))
    assert(ex.getMessage.contains("a") && ex.getMessage.contains("b"))
    // unknown input fails at validation, before anything runs
    val dangling = new PipelineGraph(spark, cat)
      .view("x", inputs = Seq("nope"))(r => r("nope"))
    val ex2 = intercept[IllegalArgumentException] { dangling.run() }
    assert(ex2.getMessage.contains("nope"))
    // a build reading something it never declared is caught
    val sneaky = new PipelineGraph(spark, cat)
      .view("src")(_ => Seq(1).toDF("v"))
      .view("y", inputs = Seq.empty)(r => r("src"))
    val ex3 = intercept[IllegalArgumentException] { sneaky.run() }
    assert(ex3.getMessage.contains("not among its declared inputs"))
    // FailRun expectation mode aborts on violation
    val failing = new PipelineGraph(spark, cat)
      .table("silver.gated", expectations = Map("pos" -> "v > 0"),
        onViolation = PipelineGraph.FailRun)(
        _ => Seq(1, -1).toDF("v"))
    intercept[IllegalStateException] { failing.run() }
    // WarnOnly (DLT expect): rows kept, violations still counted
    val warn = new PipelineGraph(spark, cat)
      .table("silver.warned", expectations = Map("pos" -> "v > 0"),
        onViolation = PipelineGraph.WarnOnly)(
        _ => Seq(1, -1, 2).toDF("v"))
    val wr = warn.run()
    assert(cat.read("silver", "warned").count() == 3,
      "monitor mode must keep every row")
    assert(wr.violations("silver.warned") == Map("pos" -> 1L))
  }
}
