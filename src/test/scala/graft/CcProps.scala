package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Dedup

/** Property-based connected-components invariants (fixed-seed scalacheck,
  * the MergeProps pattern): for RANDOM undirected graphs — duplicate
  * edges, both orientations, self-loops, isolated nodes — the
  * pointer-doubling min-label propagation must assign every node the
  * MINIMUM doc_id of its component, exactly what a sequential union-find
  * computes. Adversarial shapes ride along: a long chain (the
  * O(log diameter) pointer-doubling case), the empty edge set, and a
  * complete graph.
  */
class CcProps extends SparkSuite {
  import spark.implicits._

  // sequential oracle: union-find with path compression, min-id labels
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // min-id of a component IS its root here because union always keeps
    // the smaller root
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def run(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val labels0 = (0L until n.toLong).toDF("doc_id")
      .withColumn("cluster_id", col("doc_id"))
    val pairs =
      if (edges.isEmpty)
        spark.emptyDataset[(Long, Long)].toDF("doc_a", "doc_b")
      else edges.toDF("doc_a", "doc_b")
    Dedup.connectedComponents(labels0, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def check(n: Int, edges: Seq[(Long, Long)], what: String): Unit =
    assert(run(n, edges) == unionFind(n, edges), s"$what: n=$n edges=$edges")

  test("random graphs: min-label fixpoint == sequential union-find") {
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 19L)
      b <- Gen.chooseNum(0L, 19L)
    } yield (a, b)
    val graphGen = Gen.chooseNum(0, 30).flatMap(m => Gen.listOfN(m, edgeGen))
    (1 to 6).foreach { c =>
      val edges = graphGen.apply(Gen.Parameters.default, Seed(4200L + c)).get
      check(20, edges, s"case $c")
    }
  }

  test("chain graph: high diameter converges (pointer-doubling path)") {
    val n = 64
    check(n, (0L until (n - 1).toLong).map(i => (i + 1, i)), "chain")
  }

  test("empty edge set: every node is its own cluster") {
    check(12, Nil, "empty")
  }

  test("complete graph + self-loops collapse to node 0") {
    val n = 10
    val full = for { a <- 0L until n.toLong; b <- 0L until n.toLong } yield (a, b)
    check(n, full, "complete")
  }
}
