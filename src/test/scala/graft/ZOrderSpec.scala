package graft

import org.apache.spark.sql.functions._

import graft.layout.ZOrder

/** Z-order clustering: the Morton encoding itself, the layout effect it
  * exists for (per-file min/max tight on ALL clustered columns — the
  * file-skipping signal), and the OPTIMIZE ... ZORDER BY SQL surface. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  private def morton(vals: Seq[Long], bits: Int): Long =
    (0 until bits).flatMap(i => vals.zipWithIndex.map { case (v, j) =>
      ((v >> i) & 1L) << (i * vals.size + j)
    }).sum // disjoint bits: sum == or

  test("interleave matches a reference Morton encoding") {
    val triples = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L),
      (3L, 5L, 7L), (65535L, 65535L, 65535L), (12345L, 54321L, 2L))
    val got = triples.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        ZOrder.interleave(Seq(col("a"), col("b")), 16).as("z2"),
        ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 16).as("z3"))
      .collect()
    got.foreach { r =>
      val v = Seq(r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getAs[Long]("z2") == morton(v.take(2), 16), s"z2 for $v")
      assert(r.getAs[Long]("z3") == morton(v, 16), s"z3 for $v")
    }
    // 62-bit guard: 4 cols x 16 bits would overflow
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq(col("a"), col("b"), col("c"), col("a")), 16)
    }
  }

  test("z-clustered files are tight on BOTH dimensions; contents unchanged") {
    // deterministic pseudo-uniform 2-d points, then a shuffled baseline
    val df = spark.range(4096).select(
      (col("id") * 2654435761L % 10007).as("x"),
      (col("id") * 40503 % 9973).as("y"))
    val base = tmpDir("graft-z-base"); val zdir = tmpDir("graft-z-clu")
    df.repartition(16).write.mode("overwrite").parquet(base)
    ZOrder.cluster(df, Seq("x", "y"), 16).write.mode("overwrite").parquet(zdir)

    def avgSpans(dir: String): (Double, Double) = {
      val s = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).head()
      (s.getDouble(0), s.getDouble(1))
    }
    val (bx, by) = avgSpans(base)
    val (zx, zy) = avgSpans(zdir)
    // 16 z-range files = ~2 prefix bits per dimension: expect ~1/4 spans;
    // the shuffled baseline's files each cover ~the full range
    assert(zx < 0.6 * bx, s"x span not tightened: $zx vs $bx")
    assert(zy < 0.6 * by, s"y span not tightened: $zy vs $by")
    // same rows, just moved
    val back = spark.read.parquet(zdir)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("string columns cluster via the hash fallback without losing rows") {
    val df = spark.range(512).select(
      concat(lit("u"), (col("id") % 37).cast("string")).as("name"),
      col("id").as("x"))
    val dir = tmpDir("graft-z-str")
    ZOrder.cluster(df, Seq("name", "x"), 8).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
      "hash-fallback clustering changed the data")
  }

  test("OPTIMIZE ... ZORDER BY (x, y): new version, same contents, clustered") {
    val cat = new graft.catalog.Catalog(spark, tmpDir("graft-z-sql"))
    val df = spark.range(4096).select(
      (col("id") * 2654435761L % 10007).as("x"),
      (col("id") * 40503 % 9973).as("y"))
    cat.overwriteSnapshot(df.repartition(16), "gold", "zo")
    cat.register("gold", "zo")
    // force a multi-file rewrite so clustering is observable
    val bytes = new java.io.File(cat.path("gold", "zo")).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    spark.conf.set("spark.graft.optimize.targetFileSize", (bytes / 8).toString)
    try graft.sql.GraftSql.sql(spark, "OPTIMIZE gold.zo ZORDER BY (x, y)")
    finally spark.conf.unset("spark.graft.optimize.targetFileSize")
    assert(cat.currentVersion("gold", "zo") == 2)
    val after = cat.read("gold", "zo")
    assert(after.exceptAll(df).isEmpty && df.exceptAll(after).isEmpty)
    val span = after.groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("sx")).agg(avg("sx")).head().getDouble(0)
    assert(span < 0.7 * 10007, s"files not x-clustered after ZORDER: $span")
    // plain OPTIMIZE still parses (no ZORDER group)
    graft.sql.GraftSql.sql(spark, "OPTIMIZE gold.zo")
    assert(cat.currentVersion("gold", "zo") >= 2)
    cat.dropRegistration("gold", "zo")
  }
}
