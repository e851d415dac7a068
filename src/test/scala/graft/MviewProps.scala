package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.catalog.{Catalog, ChangeFeed}

/** Property-based incremental-view-maintenance invariants, sampled from
  * scalacheck generators with fixed seeds (the MergeProps pattern): for a
  * RANDOM sequence of source states — overwrites carrying any mix of
  * inserts, deletes, duplicate rows, negative values, and total wipes —
  * the incrementally maintained sum/count view after each REFRESH must
  * equal the one-shot GROUP BY over that state (classic IVM soundness:
  * folding bag-diff deltas as signed partials agrees with recompute), and
  * a crash-replay (cursor rolled back one version) must change nothing. */
class MviewProps extends SparkSuite {
  import spark.implicits._

  // small multisets: few keys so deletes/updates/group-wipes actually
  // collide; duplicate (k, v) rows exercise the bag (exceptAll) diff;
  // negative values exercise signed sums; size 0 wipes the whole state
  private val rowGen: Gen[(String, Long)] = for {
    k <- Gen.oneOf("a", "b", "c", "d")
    v <- Gen.chooseNum(-3L, 3L)
  } yield (k, v)

  private val stateGen: Gen[List[(String, Long)]] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, rowGen))

  private def history(seed: Long, n: Int): Seq[List[(String, Long)]] =
    (0 until n).map(i =>
      stateGen.apply(Gen.Parameters.default, Seed(seed * 100 + i)).get)

  private def expected(s: List[(String, Long)]): Map[String, (Long, Long)] =
    s.groupBy(_._1).map { case (k, rows) =>
      k -> ((rows.map(_._2).sum, rows.size.toLong)) }

  private def observed(name: String): Map[String, (Long, Long)] =
    spark.table(name).collect()
      .map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("s"), r.getAs[Long]("n")))).toMap

  test("random overwrite histories: incremental REFRESH == full recompute, replay-stable") {
    (1 to 4).foreach { c =>
      val states = history(c.toLong, 5)
      val cat = new Catalog(spark, tmpDir(s"graft-mvprops$c"))
      val view = s"gold.mvp$c"
      val cursor = cat.path("gold", s"mvp$c") + ".mviewcursor"
      def writeSrc(s: List[(String, Long)]): Unit =
        cat.overwriteSnapshot(
          if (s.isEmpty) spark.emptyDataset[(String, Long)].toDF("k", "v")
          else s.toDF("k", "v"),
          "silver", s"mvps$c")
      writeSrc(states.head)
      cat.register("silver", s"mvps$c")
      graft.sql.GraftSql.sql(spark,
        s"""CREATE MATERIALIZED VIEW $view AS
            SELECT k, sum(v) AS s, count(*) AS n
            FROM silver.mvps$c GROUP BY k""")
      assert(observed(view) == expected(states.head),
        s"case $c: CREATE state diverged")
      states.tail.zipWithIndex.foreach { case (s, i) =>
        writeSrc(s)
        graft.sql.GraftSql.sql(spark, s"REFRESH MATERIALIZED VIEW $view")
        assert(observed(view) == expected(s),
          s"case $c step $i: incremental refresh diverged from recompute")
        // crash-replay: the cursor commit is lost, the SAME (from, to]
        // window re-presents — the view must not move
        val v = ChangeFeed.readCursor(spark, cursor).get
        ChangeFeed.commitCursor(spark, cursor, v - 1)
        graft.sql.GraftSql.sql(spark, s"REFRESH MATERIALIZED VIEW $view")
        assert(observed(view) == expected(s),
          s"case $c step $i: crash-replayed delta moved the view")
      }
      graft.sql.GraftSql.sql(spark, s"DROP MATERIALIZED VIEW $view")
      spark.sql(s"DROP TABLE silver.mvps$c")
    }
  }
}
