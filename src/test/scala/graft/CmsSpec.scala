package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMinAgg
import graft.operators.SketchQueries

/** Count–Min sketch contract: never undercounts, overcounts by at most
  * ε·N, partial sketches merge exactly (distribution-safety — the map-side
  * combine must equal the single-pass build), and the q181 query's
  * embedded audit holds on real fixture data. */
class CmsSpec extends SparkSuite {
  import spark.implicits._

  test("estimates never undercount and respect the eps*N bound") {
    // planted zipf-ish corpus: token t_i appears i times, N = 5050
    val rows = (1 to 100).flatMap(i => Seq.fill(i)(s"t$i"))
    val df = rows.toDF("tok")
    val sk = df.agg(CountMinAgg.countMinAgg(col("tok")).as("s"))
      .head().getAs[Array[Byte]]("s")
    val n = rows.size
    val slack = math.ceil(math.E / CountMinAgg.DefaultWidth * n).toLong
    (1 to 100).foreach { i =>
      val est = CountMinAgg.estimate(sk, s"t$i")
      assert(est >= i, s"t$i: undercount $est < $i")
      assert(est <= i + slack, s"t$i: $est exceeds $i + $slack")
    }
    // a value never inserted estimates at most the collision slack
    assert(CountMinAgg.estimate(sk, "absent") <= slack)
  }

  test("partial sketches merge to exactly the single-pass sketch") {
    val rows = (1 to 60).flatMap(i => Seq.fill(i % 7 + 1)((i % 2, s"w$i")))
    val df = rows.toDF("g", "tok")
    val whole = df.agg(CountMinAgg.countMinAgg(col("tok")).as("s"))
      .head().getAs[Array[Byte]]("s")
    val parts = df.groupBy("g")
      .agg(CountMinAgg.countMinAgg(col("tok")).as("s"))
      .collect().map(_.getAs[Array[Byte]]("s"))
    val merged = parts.reduce(CountMinAgg.mergeBytes)
    assert(java.util.Arrays.equals(merged, whole),
      "merge of per-group sketches must be bit-identical to one pass")
  }

  test("streaming: sketch maintained across micro-batches == batch build") {
    // the TypedImperativeAggregate state must fold correctly through the
    // streaming agg state store — the shape a live ingest pipeline uses
    // to keep a running token-frequency profile
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val q = in.toDF().toDF("tok")
      .agg(CountMinAgg.countMinAgg(col("tok")).as("sk"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      val b1 = (1 to 40).map(i => s"x${i % 7}")
      val b2 = (1 to 25).map(i => s"y${i % 4}")
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("cms_stream").head().getAs[Array[Byte]]("sk")
      val want = (b1 ++ b2).toDF("tok")
        .agg(CountMinAgg.countMinAgg(col("tok")).as("sk"))
        .head().getAs[Array[Byte]]("sk")
      assert(java.util.Arrays.equals(got, want),
        "streamed sketch must equal the one-shot batch sketch")
    } finally q.stop()
  }

  test("q187 unseen mass: hapax share on a planted frequency profile") {
    import graft.operators.SketchQueries
    val dir = tmpDir("gt") + "/d"
    // en: tokens a(3x), b(1x), c(1x) → N=5, V=3, N1=2, N2=0
    Seq((1L, "a a a b", "en", "s", 7L), (2L, "c", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = SketchQueries.unseenMass(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 5L && r.getAs[Long]("vocab") == 3L)
    assert(r.getAs[Long]("hapax") == 2L && r.getAs[Long]("doubleton") == 0L)
    assert(r.getAs[Long]("unseen_ppm") == 1000000L * 2 / 5)
  }

  test("q181 heavy hitters: exact top-k with a green sketch audit") {
    val out = SketchQueries.heavyHitters(spark, sf0001).collect()
    assert(out.length == 20)
    assert(out.forall(_.getAs[Boolean]("cms_ok")),
      "every top-k estimate must sit inside the CM bound")
    // exact counts must match a direct aggregate
    val direct = Tables.load(spark, sf0001, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t").asc).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      direct.toSeq)
  }
}
