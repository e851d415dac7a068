package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.catalog.{Catalog, ChangeFeed}
import graft.pipeline.MaterializedJoin

/** Property-based invariants for the incrementally maintained join view
  * (the denormalization half of the MV story), sampled with fixed seeds
  * (the MergeProps pattern): for RANDOM fact and dim histories — inserts,
  * deletes, payload updates, join-key MOVES, late-arriving dims, dim
  * deletes, total wipes — the view after every refresh must equal the
  * full `fact LEFT JOIN dim` recomputed from scratch, and a crash-replay
  * (both cursors rolled back) must leave it unchanged (the documented
  * at-least-once + idempotent-apply posture). */
class MaterializedJoinProps extends SparkSuite {
  import spark.implicits._

  // few oids/custs so updates, key moves, and shared-dim fan-out collide;
  // cust range wider than the dim pk range so NULL dim fills occur
  private val factGen: Gen[Map[Long, (Long, Long)]] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, for {
      oid <- Gen.chooseNum(1L, 6L)
      cust <- Gen.chooseNum(10L, 14L)
      amt <- Gen.chooseNum(-3L, 3L)
    } yield (oid, (cust, amt))).map(_.toMap))

  private val dimGen: Gen[Map[Long, String]] =
    Gen.chooseNum(0, 4).flatMap(n => Gen.listOfN(n, for {
      c <- Gen.chooseNum(10L, 13L)
      nm <- Gen.oneOf("x", "y", "z")
    } yield (c, nm)).map(_.toMap))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("random fact/dim histories: view == full re-join after every refresh, replay-stable") {
    (1 to 3).foreach { c =>
      val root = tmpDir(s"graft-mjprops$c")
      val cat = new Catalog(spark, s"$root/wh")
      def writeFact(m: Map[Long, (Long, Long)]): Unit =
        cat.overwriteSnapshot(
          if (m.isEmpty) spark.emptyDataset[(Long, Long, Long)]
            .toDF("oid", "cust", "amt")
          else m.toSeq.map { case (o, (cu, a)) => (o, cu, a) }
            .toDF("oid", "cust", "amt"),
          "silver", "fact")
      def writeDim(m: Map[Long, String]): Unit =
        cat.overwriteSnapshot(
          if (m.isEmpty) spark.emptyDataset[(Long, String)]
            .toDF("c_id", "c_name")
          else m.toSeq.toDF("c_id", "c_name"),
          "silver", "dim")
      // build needs both sources present; states may still go empty later
      writeFact(sample(factGen, c * 1000L))
      writeDim(sample(dimGen, c * 1000L + 500))
      val mj = new MaterializedJoin(spark,
        cat.path("silver", "fact"), Seq("oid"), "cust",
        cat.path("silver", "dim"), "c_id", Seq("c_name"),
        s"$root/view", nBuckets = 4)
      mj.build()
      def assertConverged(step: String): Unit = {
        val expect = cat.read("silver", "fact")
          .join(cat.read("silver", "dim"),
            col("cust") === col("c_id"), "left_outer")
          .select(col("oid"), col("cust"), col("amt"), col("c_name"))
        assert(rowsOf(mj.read(), "oid") == rowsOf(expect, "oid"),
          s"case $c $step: view diverged from the full join")
      }
      assertConverged("build")
      (0 until 4).foreach { i =>
        writeFact(sample(factGen, c * 1000L + i + 1))
        writeDim(sample(dimGen, c * 1000L + 500 + i + 1))
        mj.refresh()
        assertConverged(s"step $i")
        // crash-replay: both cursor commits lost — the re-pulled windows
        // must re-apply idempotently
        Seq(s"$root/view.cursors/fact", s"$root/view.cursors/dim")
          .foreach { cf =>
            val v = ChangeFeed.readCursor(spark, cf).get
            if (v > 1) ChangeFeed.commitCursor(spark, cf, v - 1)
          }
        mj.refresh()
        assertConverged(s"step $i replay")
      }
    }
  }
}
