package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphQueries, SearchQueries}

/** Invariants for PageRank (q143) and DSIR importance weighting (q142)
  * beyond the driver's hash-compare: exact hand-computed fixed points /
  * planted-distribution separations, plus the conservation law the
  * integer-ppb update must respect. */
class GraphQueriesSpec extends SparkSuite {

  private def writeTrade(dir: String,
      orders: Seq[(Long, Long)], lineitem: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    orders.toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    lineitem.toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
  }

  test("pagerank: two-node symmetric graph is an exact fixed point") {
    val dir = tmpDir("pr2") + "/d"
    // one order by customer 7, one lineitem from supplier 3 → C7 ↔ S3
    writeTrade(dir, Seq((1L, 7L)), Seq((1L, 3L)))
    // contrib = 1e9 DIV 1; update = 0.15e9 + 85*1e9 DIV 100 = 1e9 exactly
    val out = GraphQueries.pageRank(spark, dir, iters = 4).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("C7", "S3"))
    assert(out.forall(_.getAs[Long]("rank_ppb") == 1000000000L))
  }

  test("pagerank: star hub gets the mass, leaves split it — exact") {
    val dir = tmpDir("prstar") + "/d"
    // three customers, one supplier: C1, C2, C3 each ↔ S9 (w = 1)
    writeTrade(dir, Seq((1L, 1L), (2L, 2L), (3L, 3L)),
      Seq((1L, 9L), (2L, 9L), (3L, 9L)))
    val out = GraphQueries.pageRank(spark, dir, iters = 1).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("rank_ppb")).toMap
    // hub: 0.15e9 + 85 * (3 * 1e9) DIV 100
    assert(out("S9") == 150000000L + 85L * 3000000000L / 100L)
    // each leaf: hub's 1e9 splits 3 ways (DIV truncates), then damped
    val leaf = 150000000L + 85L * (1000000000L / 3L) / 100L
    assert(Seq("C1", "C2", "C3").forall(out(_) == leaf))
  }

  test("pagerank on sf0.001: mass conserved, hubs rank above leaves") {
    val out = GraphQueries.pageRank(spark, sf0001).cache()
    val n = out.count()
    val total = out.agg(sum("rank_ppb")).head.getLong(0)
    // truncation only loses ppb fractions: per node per round ≤ ~1 ppb
    // per in-edge; bound generously at 0.1% of total mass
    val ideal = n * 1000000000L
    assert(total <= ideal && total > ideal - ideal / 1000)
    // suppliers are ~15× higher degree than customers in the trade
    // graph — the top of the ranking must be all suppliers
    val top = out.orderBy(col("rank_ppb").desc).limit(10).collect()
    assert(top.forall(_.getString(0).startsWith("S")))
    // determinism: a second run is bit-identical
    val again = GraphQueries.pageRank(spark, sf0001)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("pagerank with a reliable checkpointDir: identical ranks, " +
      "per-round lineage truncation (one checkpoint RDD per iteration), " +
      "result plan rooted at the pinned RDD") {
    val ckpt = tmpDir("pr-ckpt")
    val plain = GraphQueries.pageRank(spark, sf0001, iters = 3)
      .collect().map(_.toSeq).toSeq
    val pinned = GraphQueries.pageRank(spark, sf0001, iters = 3,
      checkpointDir = Some(ckpt))
    assert(pinned.collect().map(_.toSeq).toSeq == plain)
    // reliable per-round checkpoints materialized into the dir: one
    // RDD per iteration (the final round doubles as the result pin)
    def rddDirs(d: java.io.File): Seq[String] =
      if (!d.exists()) Nil
      else d.listFiles().toSeq.flatMap(f =>
        if (f.isDirectory)
          (if (f.getName.startsWith("rdd-")) Seq(f.getName) else Nil) ++
            rddDirs(f)
        else Nil)
    val n = rddDirs(new java.io.File(ckpt)).size
    assert(n >= 3, s"expected >=3 per-round checkpoint RDDs, found $n")
    // lineage truncated: the result subtree is a LogicalRDD scan, not
    // the 3-round join/agg tower
    val logical = pinned.queryExecution.optimizedPlan.toString
    assert(logical.contains("LogicalRDD") ||
      pinned.queryExecution.optimizedPlan.collectLeaves().forall(
        _.getClass.getSimpleName.contains("LogicalRDD")),
      s"lineage not truncated:\n$logical")
  }

  test("dsir: planted two-language corpus separates exactly") {
    import spark.implicits._
    val dir = tmpDir("dsir") + "/d"
    val docs = (0L to 4L).map(i => (i, "alpha alpha alpha", "en")) ++
      (5L to 9L).map(i => (i, "beta beta beta", "de"))
    docs.toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val out = SearchQueries.dsirWeight(spark, dir, "en", topK = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dsir_ppm"), r.getAs[Long]("picked"))).toMap
    // cr(alpha)=15 ct=15, cr(beta)=15 ct=0, Nr=30 Nt=15 V=2:
    // ratio(alpha) = 16*32e6 DIV (16*17) = 1882352 ppm
    // ratio(beta)  =  1*32e6 DIV (16*17) =  117647 ppm
    (0L to 4L).foreach(i => assert(out(i) == (1882352L, 1L)))
    (5L to 9L).foreach(i => assert(out(i) == (117647L, 0L)))
  }

  private def writeBaskets(dir: String, baskets: Seq[(Long, Seq[Long])])
      : Unit = {
    import spark.implicits._
    baskets.flatMap { case (ok, parts) => parts.map(p => (ok, p)) }
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
  }

  test("triangles: hand-built triangle + pendant — exact counts") {
    val dir = tmpDir("tri") + "/d"
    // {1,2,3} co-bought twice → triangle; {1,4} twice → pendant edge;
    // {2,5} once → below support, never an edge
    writeBaskets(dir, Seq(
      (1L, Seq(1L, 2L, 3L)), (2L, Seq(1L, 2L, 3L)),
      (3L, Seq(1L, 4L)), (4L, Seq(1L, 4L)), (5L, Seq(2L, 5L))))
    val out = GraphQueries.triangleCount(spark, dir).collect()
      .map(r => r.getAs[Long]("part") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("triangles"),
          r.getAs[Long]("clustering_ppm"))).toMap
    // node 1: degree 3 (2,3,4), 1 triangle, cc = 2·1e6 DIV 6
    assert(out(1L) == ((3L, 1L, 333333L)))
    assert(out(2L) == ((2L, 1L, 1000000L)))
    assert(out(3L) == ((2L, 1L, 1000000L)))
    // pendant: degree 1 → cc defined as 0
    assert(out(4L) == ((1L, 0L, 0L)))
    // part 5's only pair was seen once — not in the graph at all
    assert(!out.contains(5L))
  }

  test("link prediction (q238): 4-cycle predicts exactly the two " +
      "diagonals, never an existing edge") {
    val dir = tmpDir("lp") + "/d"
    // square 1—2—3—4—1 (each edge co-bought twice): the only pairs with
    // a common neighbor and no edge are the diagonals (1,3) and (2,4) —
    // two shared neighbors each, full-overlap jaccard 1e6
    writeBaskets(dir, Seq(
      (1L, Seq(1L, 2L)), (2L, Seq(1L, 2L)),
      (3L, Seq(2L, 3L)), (4L, Seq(2L, 3L)),
      (5L, Seq(1L, 4L)), (6L, Seq(1L, 4L)),
      (7L, Seq(3L, 4L)), (8L, Seq(3L, 4L))))
    val out = GraphQueries.linkPrediction(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 3L, 2L, 1000000L),
      (2L, 4L, 2L, 1000000L)), s"wrong predictions: ${out.toSeq}")
  }

  test("link prediction on sf0.001: no predicted pair is an edge, " +
      "scores well-formed") {
    import org.apache.spark.sql.functions._
    val out = GraphQueries.linkPrediction(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= 50)
    out.foreach { r =>
      assert(r.getAs[Long]("cn") >= 1L)
      val j = r.getAs[Long]("jaccard_ppm")
      assert(j > 0L && j <= 1000000L)
    }
    // recompute the support-2 edge set independently; no overlap allowed
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = li.as("a")
      .join(li.as("b"), col("a.ok") === col("b.ok") &&
        col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("s")).filter(col("s") >= 2)
      .select("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { r =>
      val p = (r.getAs[Long]("u"), r.getAs[Long]("v"))
      assert(!edges(p), s"predicted pair $p is already an edge")
    }
  }

  test("triangles: duplicate lineitem rows collapse before pairing") {
    val dir = tmpDir("tridup") + "/d"
    // part 1 appears twice in order 1 — (ok, pk) distinct must dedupe,
    // or the pair support double-counts and a once-seen pair survives
    writeBaskets(dir, Seq((1L, Seq(1L, 1L, 2L)), (2L, Seq(3L, 4L))))
    assert(GraphQueries.triangleCount(spark, dir).collect().isEmpty)
  }

  test("triangles on sf0.001: edge frame shuffles once (ReusedExchange)") {
    val df = GraphQueries.triangleCount(spark, sf0001)
    df.collect() // run through AQE so the final plan exists
    val p = df.queryExecution.executedPlan.toString
    // the support-filtered edge aggregate feeds four consumers; its
    // exchange must be reused, not recomputed from four lineitem scans
    val scans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(scans <= 1 || p.contains("ReusedExchange"),
      s"edge subplan recomputed ($scans lineitem scans, no reuse):\n$p")
  }

  test("label propagation: disjoint triangles converge to one label each") {
    val dir = tmpDir("lpa") + "/d"
    writeBaskets(dir, Seq(
      (1L, Seq(1L, 2L, 3L)), (2L, Seq(1L, 2L, 3L)),
      (3L, Seq(4L, 5L, 6L)), (4L, Seq(4L, 5L, 6L))))
    val out = GraphQueries.labelPropagation(spark, dir).collect()
      .map(r => r.getAs[Long]("part") ->
        (r.getAs[Long]("label"), r.getAs[Long]("community_size"))).toMap
    // round 1 (min tie-break): 1→2, 2→1, 3→1; round 2: all → 1
    assert(Seq(1L, 2L, 3L).forall(out(_) == ((1L, 3L))),
      s"triangle one fragmented: $out")
    assert(Seq(4L, 5L, 6L).forall(out(_) == ((4L, 3L))),
      s"triangle two fragmented: $out")
  }

  test("label propagation on sf0.001: deterministic, sizes consistent") {
    val a = GraphQueries.labelPropagation(spark, sf0001).collect()
    val b = GraphQueries.labelPropagation(spark, sf0001).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "label propagation is not deterministic across runs")
    // community sizes are consistent with the label column
    val byLabel = a.groupBy(_.getAs[Long]("label"))
    a.foreach { r =>
      assert(r.getAs[Long]("community_size") ==
        byLabel(r.getAs[Long]("label")).length)
    }
  }

  test("hits: planted hub supplier takes max authority, scores in ppm") {
    val dir = tmpDir("hits") + "/d"
    // cust 1 buys from supp 1 and 2; cust 2 and 3 buy only from supp 2:
    // supp 2 is touched by every customer → the authority
    writeTrade(dir,
      Seq((1L, 1L), (2L, 2L), (3L, 3L)),
      Seq((1L, 1L), (1L, 2L), (2L, 2L), (3L, 2L)))
    val out = GraphQueries.hits(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("node")) ->
        r.getAs[Long]("score_ppm")).toMap
    assert(out(("authority", 2L)) == 1000000L,
      "max-normalized authority must peak at exactly 1e6")
    assert(out(("authority", 2L)) > out(("authority", 1L)))
    // cust 1 reaches both suppliers → the strongest hub
    assert(out(("hub", 1L)) == 1000000L)
    assert(out(("hub", 1L)) > out(("hub", 2L)))
    assert(out(("hub", 2L)) == out(("hub", 3L)),
      "symmetric single-edge customers must tie")
  }

  test("hits on sf0.001: normalization bounds hold, runs deterministic") {
    val a = GraphQueries.hits(spark, sf0001).collect()
    val b = GraphQueries.hits(spark, sf0001).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.forall(r => r.getAs[Long]("score_ppm") >= 0 &&
      r.getAs[Long]("score_ppm") <= 1000000L))
    Seq("hub", "authority").foreach { role =>
      assert(a.filter(_.getString(0) == role)
        .map(_.getAs[Long]("score_ppm")).max == 1000000L,
        s"$role scores must be max-normalized to exactly 1e6")
    }
  }

  test("dsir on sf0.001: every doc scored once, top-k flag is exact") {
    val out = SearchQueries.dsirWeight(spark, sf0001, "en", topK = 25)
      .cache()
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    assert(rows.count(_.getAs[Long]("picked") == 1L) == 25)
    // the picked set IS the top-25 by (dsir desc, doc_id asc)
    val byScore = rows.sortBy(r =>
      (-r.getAs[Long]("dsir_ppm"), r.getAs[Long]("doc_id"))).take(25)
    assert(byScore.forall(_.getAs[Long]("picked") == 1L))
    out.unpersist()
  }

  test("q219 seed distance: BFS propagates hop by hop, respects the " +
      "cap, and reports unreachable components") {
    import spark.implicits._
    // path S10(seed)—C1—S11—C2—S13 plus a disconnected C3—S25:
    // dist(S10)=0, C1=1, S11=2, C2=3; S13 needs 4 hops -> capped to -1;
    // the C3/S25 component is unreachable entirely
    val orders = Seq((100L, 1L), (101L, 1L), (102L, 2L), (103L, 2L),
      (104L, 3L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((100L, 10L), (101L, 11L), (102L, 11L),
      (103L, 13L), (104L, 25L)).toDF("l_orderkey", "l_suppkey")
    val dir = tmpDir("bfs") + "/t"
    orders.write.parquet(s"$dir/orders.parquet")
    lineitem.write.parquet(s"$dir/lineitem.parquet")
    val got = GraphQueries.seedDistance(spark, dir).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("dist")).toMap
    assert(got == Map("S10" -> 0L, "C1" -> 1L, "S11" -> 2L, "C2" -> 3L,
      "S13" -> -1L, "C3" -> -1L, "S25" -> -1L), s"got $got")
  }

  test("wedge degree cap: hub adjacency is bounded in both roles and " +
      "candidate volume respects the cap on a synthetic hub graph") {
    import spark.implicits._
    // star: hub 0 ↔ leaves 1..300 (symmetrized), plus a small clique so
    // non-hub structure survives the cap untouched
    val hubDeg = 300
    val star = (1 to hubDeg).flatMap(i => Seq((0L, i.toLong), (i.toLong, 0L)))
    val clique = Seq((1001L, 1002L), (1002L, 1001L), (1001L, 1003L),
      (1003L, 1001L), (1002L, 1003L), (1003L, 1002L))
    val sym = (star ++ clique).toDF("u", "v")
    for (cap <- Seq(4, 16, 64)) {
      val capped = GraphQueries.capWedgeAdjacency(sym, cap).cache()
      // the declared bound holds per node in BOTH roles
      val maxOut = capped.groupBy("u").count().agg(max("count")).head.getLong(0)
      val maxIn = capped.groupBy("v").count().agg(max("count")).head.getLong(0)
      assert(maxOut <= cap && maxIn <= cap, s"cap=$cap out=$maxOut in=$maxIn")
      // wedge candidate volume respects the cap² bound per middle node
      val wedges = capped.as("a").join(capped.as("b"),
        col("a.v") === col("b.u") && col("a.u") < col("b.v")).count()
      val nodes = sym.select("u").distinct().count()
      assert(wedges <= nodes.toLong * cap * cap,
        s"cap=$cap wedges=$wedges nodes=$nodes")
      capped.unpersist()
    }
    // uncapped, the hub alone emits deg·(deg−1)/2 ordered wedge pairs —
    // the volume the cap exists to bound
    val uncapped = sym.as("a").join(sym.as("b"),
      col("a.v") === col("b.u") && col("a.u") < col("b.v")).count()
    assert(uncapped >= hubDeg.toLong * (hubDeg - 1) / 2)
    // a cap at or above the max degree is the identity — results exact
    val id = GraphQueries.capWedgeAdjacency(sym, hubDeg)
    assert(id.exceptAll(sym).isEmpty && sym.exceptAll(id).isEmpty)
  }

  test("wedge degree cap: a binding cap only DROPS candidates (monotone) " +
      "and never invents triangles") {
    // triangles through the full frame vs a tightly capped one on the
    // sf0.001 trade graph: capped counts are a subset
    val full = GraphQueries.triangleCount(spark, sf0001,
        maxWedgeDegree = Int.MaxValue)
      .select("part", "triangles").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val capped = GraphQueries.triangleCount(spark, sf0001, maxWedgeDegree = 2)
      .select("part", "triangles").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped.keySet == full.keySet) // degree rows come from full edges
    assert(capped.forall { case (p, t) => t <= full(p) })
  }
}
