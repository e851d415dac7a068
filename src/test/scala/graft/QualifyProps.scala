package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sql.GraftSql

/** Property-based QUALIFY semantics: random tables × a grid of window
  * predicates and clause tails, every lowered statement compared
  * row-for-row against the hand-written hidden-column subquery it is
  * DEFINED to equal. QualifySpec pins one scenario per shape; this pins
  * the string rewriter over random data and random clause combinations —
  * the failure mode of a text-level parser feature is an edge shape, not
  * a single case. Fixed-seed sampling (the MergeProps pattern). */
class QualifyProps extends SparkSuite {
  import spark.implicits._

  private val tableGen: Gen[List[(Long, String, Long)]] =
    Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, for {
      id <- Gen.chooseNum(1L, 100L)
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-9L, 9L)
    } yield (id, g, v)))

  private def sample(seed: Long): List[(Long, String, Long)] =
    tableGen.apply(Gen.Parameters.default, Seed(seed)).get
      .distinctBy(_._1) // unique ids keep every window rank deterministic

  // (predicate, needs-deterministic-order) pairs exercised per table
  private val preds = Seq(
    "row_number() OVER (PARTITION BY g ORDER BY v DESC, id) = 1",
    "rank() OVER (ORDER BY v, id) <= 3",
    "v = max(v) OVER (PARTITION BY g)",
    "count(*) OVER (PARTITION BY g) > 2",
    "lag(v) OVER (PARTITION BY g ORDER BY id) IS NULL",
    "sum(v) OVER (PARTITION BY g ORDER BY id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) >= 0")

  private val tails = Seq("", " ORDER BY id", " ORDER BY id LIMIT 3")

  test("lowered QUALIFY equals the hand-written subquery on random tables") {
    var checked = 0
    for (seed <- 1L to 12L) {
      val rows = sample(seed)
      if (rows.nonEmpty) {
        rows.toDF("id", "g", "v").createOrReplaceTempView("qp_t")
        for (pred <- preds; tail <- tails) {
          val got = GraftSql.sql(spark,
            s"SELECT id, g, v FROM qp_t QUALIFY $pred$tail")
          val want = spark.sql(
            s"""SELECT id, g, v FROM (
                  SELECT id, g, v, ($pred) AS __q FROM qp_t)
                WHERE __q$tail""")
          // LIMIT without ORDER BY would be nondeterministic — every
          // LIMIT tail in the grid carries an ORDER BY, so sorted-row
          // comparison is exact
          val a = got.collect().map(_.toSeq).sortBy(_.toString)
          val b = want.collect().map(_.toSeq).sortBy(_.toString)
          assert(a.toSeq == b.toSeq,
            s"seed=$seed pred='$pred' tail='$tail': $a vs $b")
          checked += 1
        }
      }
    }
    assert(checked >= 150, s"only $checked combinations exercised")
  }

  test("QUALIFY after GROUP BY equals the aggregated subquery on random tables") {
    for (seed <- 20L to 26L) {
      val rows = sample(seed)
      if (rows.nonEmpty) {
        rows.toDF("id", "g", "v").createOrReplaceTempView("qp_t")
        val got = GraftSql.sql(spark,
          """SELECT g, sum(v) AS total FROM qp_t GROUP BY g
             QUALIFY rank() OVER (ORDER BY sum(v) DESC, g) <= 2
             ORDER BY g""").collect().map(_.toSeq)
        val want = spark.sql(
          """SELECT g, total FROM (
               SELECT g, sum(v) AS total,
                 rank() OVER (ORDER BY sum(v) DESC, g) AS r
               FROM qp_t GROUP BY g)
             WHERE r <= 2 ORDER BY g""").collect().map(_.toSeq)
        assert(got.toSeq == want.toSeq, s"seed=$seed: $got vs $want")
      }
    }
  }
}
