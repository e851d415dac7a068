package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.GraphQueries

/** Property pin for q219 (fixed-seed scalacheck): the distributed
  * capped min-plus fold must equal an in-memory BFS with the same hop
  * cap on random bipartite graphs — including graphs with multiple
  * seeds, unreachable components, and nodes exactly AT the cap. */
class BfsProps extends SparkSuite {
  import spark.implicits._

  /** In-memory BFS from all seeds, capped; -1 where unreached. */
  private def model(edges: Seq[(Long, Long)], maxHops: Int)
      : Map[String, Long] = {
    val nodes = (edges.map(e => s"C${e._1}") ++
      edges.map(e => s"S${e._2}")).distinct
    val adj = edges.flatMap { case (c, s) =>
      Seq(s"C$c" -> s"S$s", s"S$s" -> s"C$c")
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    var dist = nodes.filter(n =>
      n.startsWith("S") && n.drop(1).toLong % 10 == 0)
      .map(_ -> 0L).toMap
    var frontier = dist.keySet
    for (d <- 1 to maxHops) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Seq.empty))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> d.toLong)
      frontier = next
    }
    nodes.map(n => n -> dist.getOrElse(n, -1L)).toMap
  }

  private val caseGen: Gen[Seq[(Long, Long)]] = for {
    nEdges <- Gen.chooseNum(4, 30)
    edges <- Gen.listOfN(nEdges, for {
      c <- Gen.chooseNum(1L, 12L)
      s <- Gen.chooseNum(1L, 25L) // some s % 10 == 0 seeds, some not
    } yield (c, s))
  } yield edges

  test("q219: distributed capped min-plus == in-memory BFS on random graphs") {
    (1 to 5).foreach { cse =>
      val edges = caseGen.apply(Gen.Parameters.default, Seed(7001L + cse)).get
      // lineitem/orders carrier: order k joins customer c to supplier s
      val orders = edges.zipWithIndex
        .map { case ((c, _), i) => (i.toLong, c) }
        .toDF("o_orderkey", "o_custkey")
      val lineitem = edges.zipWithIndex
        .map { case ((_, s), i) => (i.toLong, s) }
        .toDF("l_orderkey", "l_suppkey")
      val dir = tmpDir(s"bfsp$cse") + "/t"
      orders.write.parquet(s"$dir/orders.parquet")
      lineitem.write.parquet(s"$dir/lineitem.parquet")
      val got = GraphQueries.seedDistance(spark, dir).collect()
        .map(r => r.getAs[String]("node") -> r.getAs[Long]("dist")).toMap
      assert(got == model(edges, 3), s"case $cse: edges=$edges")
    }
  }
}
