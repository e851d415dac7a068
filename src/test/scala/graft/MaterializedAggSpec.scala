package graft

import org.apache.spark.sql.functions._

import graft.pipeline.MaterializedAgg
import graft.pipeline.MaterializedAgg._

/** MaterializedAgg invariants the q81 oracle can't see: exactly-once
  * replay, bucket-pruned refresh I/O, version history, and the bucketed
  * layout's parity with the snapshot layout. */
class MaterializedAggSpec extends SparkSuite {
  import spark.implicits._

  private def batches = Seq(
    Seq((1L, 10L), (2L, 20L), (1L, 30L)),
    Seq((2L, 5L), (3L, 7L)),
    Seq((1L, 100L), (3L, 1L), (4L, 4L))).map(_.toDF("k", "v"))

  private def expected = Map(
    1L -> (3L, 140L, 10L, 100L),
    2L -> (2L, 25L, 5L, 20L),
    3L -> (2L, 8L, 1L, 7L),
    4L -> (1L, 4L, 4L, 4L))

  private def measures = Seq(CountRows("n"), Sum(col("v"), "s"),
    Min(col("v"), "lo"), Max(col("v"), "hi"))

  private def check(ma: MaterializedAgg): Unit = {
    val got = ma.read().collect().map(r => r.getAs[Long]("k") ->
      ((r.getAs[Long]("n"), r.getAs[Long]("s"),
        r.getAs[Long]("lo"), r.getAs[Long]("hi")))).toMap
    assert(got == expected, s"state diverged: $got")
  }

  test("declarative IncrementalAgg node accumulates across graph runs") {
    import graft.pipeline.PipelineGraph
    val cat = new graft.catalog.Catalog(spark, tmpDir("graft-ma-graph"))
    def graph = new PipelineGraph(spark, cat)
      .table("gold.roll", inputs = Seq("batch"),
        expectations = Map("positive_key" -> "k > 0"),
        materialize = PipelineGraph.IncrementalAgg(Seq("k"), measures))(
        r => r("batch"))
    // run once per batch — each run's external is that run's append;
    // a poisoned row (k = -1) is dropped by the expectation gate first
    batches.zipWithIndex.foreach { case (b, i) =>
      val withBad = if (i == 1) b.unionByName(
        Seq((-1L, 999L)).toDF("k", "v")) else b
      val res = graph.run(Map("batch" -> withBad))
      if (i == 1) assert(res.violations("gold.roll")("positive_key") == 1L)
    }
    val got = new MaterializedAgg(spark, cat, "gold", "roll", Seq("k"),
      measures).read().collect().map(r => r.getAs[Long]("k") ->
      ((r.getAs[Long]("n"), r.getAs[Long]("s"),
        r.getAs[Long]("lo"), r.getAs[Long]("hi")))).toMap
    assert(got == expected, s"graph-maintained state diverged: $got")
  }

  test("snapshot layout: three refreshes equal the full recompute; replay is a no-op") {
    val cat = new graft.catalog.Catalog(spark, tmpDir("graft-ma-snap"))
    val ma = new MaterializedAgg(spark, cat, "gold", "roll", Seq("k"), measures)
    assert(ma.lastRefreshId == -1L)
    batches.zipWithIndex.foreach { case (b, i) =>
      assert(ma.refresh(b, i.toLong), s"batch $i not applied")
    }
    check(ma)
    // replaying any covered id is dropped whole — no double counting
    assert(!ma.refresh(batches(1), 1L) && !ma.refresh(batches(2), 0L))
    check(ma)
    assert(ma.lastRefreshId == 2L)
    // refreshes are versions: the state after batch 0 is still addressable
    val v1 = cat.readVersion("gold", "roll", 1)
    assert(v1.agg(sum("n")).head().getLong(0) == 3L)
  }

  test("streaming maintenance: file-source batches maintain the aggregate exactly once") {
    val root = tmpDir("graft-ma-stream")
    val cat = new graft.catalog.Catalog(spark, s"$root/wh")
    val ma = new MaterializedAgg(spark, cat, "gold", "roll", Seq("k"), measures)
    val land = new java.io.File(s"$root/landing"); land.mkdirs()
    def drain(): Unit = graft.streaming.Streams.maintainAgg(
      spark.readStream.schema("k BIGINT, v BIGINT").parquet(land.toString),
      ma, s"$root/_cp")

    batches(0).write.mode("append").parquet(land.toString)
    drain()
    assert(ma.read().filter(col("k") === 1L).head().getAs[Long]("s") == 40L)
    batches(1).write.mode("append").parquet(land.toString)
    batches(2).write.mode("append").parquet(land.toString)
    drain()
    check(ma) // both remaining batches applied (one or two micro-batches)
    // an empty drain replays nothing and changes nothing
    drain()
    check(ma)
  }

  test("property: random batch splits always equal the full recompute") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      k <- Gen.chooseNum(1L, 20L)
      v <- Gen.chooseNum(-1000L, 1000L)
    } yield (k, v)
    val caseGen = for {
      rows <- Gen.listOfN(60, rowGen)
      nB <- Gen.chooseNum(1, 5)
    } yield (rows, nB)
    (1 to 4).foreach { i =>
      val (rows, nB) = caseGen(Gen.Parameters.default, Seed(i.toLong)).get
      val cat = new graft.catalog.Catalog(spark, tmpDir(s"graft-ma-prop$i"))
      val ma = new MaterializedAgg(spark, cat, "gold", "roll", Seq("k"),
        measures, nBuckets = if (i % 2 == 0) Some(4) else None)
      // deterministic split into nB contiguous batches
      rows.grouped(math.max(1, rows.size / nB)).zipWithIndex.foreach {
        case (b, id) => ma.refresh(b.toDF("k", "v"), id.toLong)
      }
      val full = rows.toDF("k", "v").groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("s"),
          min("v").as("lo"), max("v").as("hi"))
      val got = ma.read()
      assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty,
        s"case $i (buckets=${i % 2 == 0}, nB=$nB) diverged from recompute")
    }
  }

  test("bucketed layout: same result, refresh rewrites only touched buckets") {
    val cat = new graft.catalog.Catalog(spark, tmpDir("graft-ma-bkt"))
    val ma = new MaterializedAgg(spark, cat, "gold", "roll", Seq("k"),
      measures, nBuckets = Some(8))
    batches.zipWithIndex.foreach { case (b, i) => ma.refresh(b, i.toLong) }
    check(ma)
    assert(!ma.refresh(batches(0), 2L))
    check(ma)
    // a refresh touching one key leaves every other bucket's files alone
    val base = cat.path("gold", "roll")
    val bucketOf = graft.merge.PartitionedMerge.bucketExpr(Seq("k"), 8)
    val touched = Seq((9L, 1L)).toDF("k", "v")
      .select(bucketOf).head().getInt(0)
    def fileSet(except: Int): Set[String] =
      new java.io.File(base).listFiles()
        .filter(d => d.getName.startsWith("gbucket=") &&
          d.getName != s"gbucket=$except")
        .flatMap(_.listFiles()).map(_.getPath).toSet
    val before = fileSet(touched)
    ma.refresh(Seq((9L, 1L)).toDF("k", "v"), 3L)
    assert(fileSet(touched) == before,
      "untouched buckets were rewritten by a single-key refresh")
    assert(ma.read().filter(col("k") === 9L).head().getAs[Long]("s") == 1L)
  }
}
