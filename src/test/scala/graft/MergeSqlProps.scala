package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based MERGE INTO semantics: random target/source tables
  * driven through several clause programs whose expected result is
  * computed independently in plain Scala (first-matching-clause-wins,
  * exactly the Delta evaluation order). The handwritten MergeSqlSpec
  * cases pin one scenario each; this pins the SEMANTICS over random
  * data — matched-clause ordering, conditional deletes, NOT MATCHED BY
  * SOURCE interplay, and rows untouched when no clause condition holds.
  * Fixed-seed sampling (the MergeProps pattern). */
class MergeSqlProps extends SparkSuite {
  import spark.implicits._

  private type Row2 = (Long, Long) // (v, w) payload per key

  private val tableGen: Gen[Map[Long, Row2]] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.chooseNum(1L, 10L)
      v <- Gen.chooseNum(-5L, 5L)
      w <- Gen.chooseNum(0L, 6L)
    } yield (k, (v, w))).map(_.toMap))

  private def sample(seed: Long): Map[Long, Row2] =
    tableGen.apply(Gen.Parameters.default, Seed(seed)).get

  /** A clause program: SQL text + the same semantics in Scala.
    * expect(t, s) folds one key's state: Some(row) kept, None removed. */
  private case class Program(name: String, sql: String,
      matched: (Row2, Row2) => Option[Row2],
      notMatched: Row2 => Option[Row2],
      notMatchedBySource: Row2 => Option[Row2])

  private val programs = Seq(
    // first-match-wins ordering: the conditional UPDATE shadows DELETE
    Program("cond-update-then-delete",
      """WHEN MATCHED AND s.v > t.v THEN UPDATE SET t.v = s.v, t.w = s.w
         WHEN MATCHED THEN DELETE
         WHEN NOT MATCHED THEN INSERT (id, v, w) VALUES (s.id, s.v, s.w)""",
      matched = (t, s) => if (s._1 > t._1) Some((s._1, s._2)) else None,
      notMatched = s => Some(s),
      notMatchedBySource = t => Some(t)),
    // conditional insert: odd source rows are silently dropped
    Program("cond-insert",
      """WHEN MATCHED THEN UPDATE SET t.w = t.w + s.w
         WHEN NOT MATCHED AND s.v % 2 = 0 THEN
           INSERT (id, v, w) VALUES (s.id, s.v, s.w)""",
      matched = (t, s) => Some((t._1, t._2 + s._2)),
      notMatched = s => if (s._1 % 2 == 0) Some(s) else None,
      notMatchedBySource = t => Some(t)),
    // NOT MATCHED BY SOURCE update + conditional matched delete; rows
    // failing every matched condition stay untouched
    Program("stale-sweep",
      """WHEN MATCHED AND t.w < 3 THEN DELETE
         WHEN NOT MATCHED THEN INSERT (id, v, w) VALUES (s.id, s.v, s.w)
         WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.w = t.w + 10""",
      matched = (t, _) => if (t._2 < 3) None else Some(t),
      notMatched = s => Some(s),
      notMatchedBySource = t => Some((t._1, t._2 + 10))),
    // conditional NOT MATCHED BY SOURCE delete; matched rows recombine
    Program("source-purge",
      """WHEN MATCHED THEN UPDATE SET t.w = t.w + s.w, t.v = s.v
         WHEN NOT MATCHED BY SOURCE AND t.w % 2 = 1 THEN DELETE""",
      matched = (t, s) => Some((s._1, t._2 + s._2)),
      notMatched = _ => None,
      notMatchedBySource = t => if (t._2 % 2 == 1) None else Some(t)))

  private def expected(t: Map[Long, Row2], s: Map[Long, Row2],
      p: Program): Map[Long, Row2] = {
    val fromTarget = t.flatMap { case (k, tr) =>
      (s.get(k) match {
        case Some(sr) => p.matched(tr, sr)
        case None => p.notMatchedBySource(tr)
      }).map(k -> _)
    }
    val inserts = (s -- t.keySet).flatMap { case (k, sr) =>
      p.notMatched(sr).map(k -> _)
    }
    fromTarget ++ inserts
  }

  test("random target/source tables through every clause program match the Scala fold") {
    var n = 0
    programs.zipWithIndex.foreach { case (p, pi) =>
      (1 to 3).foreach { c =>
        n += 1
        val t = sample(pi * 100L + c)
        val s = sample(pi * 100L + c + 5000)
        val cat = new graft.catalog.Catalog(spark, tmpDir(s"graft-msqlp$n"))
        cat.create(
          if (t.isEmpty) spark.emptyDataset[(Long, Long, Long)]
            .toDF("id", "v", "w")
          else t.toSeq.map { case (k, (v, w)) => (k, v, w) }
            .toDF("id", "v", "w"),
          "gold", s"mt$n")
        cat.register("gold", s"mt$n")
        (if (s.isEmpty) spark.emptyDataset[(Long, Long, Long)]
           .toDF("id", "v", "w")
         else s.toSeq.map { case (k, (v, w)) => (k, v, w) }
           .toDF("id", "v", "w"))
          .createOrReplaceTempView(s"msrc$n")
        graft.sql.GraftSql.sql(spark,
          s"""MERGE INTO gold.mt$n t USING msrc$n s ON t.id = s.id
              ${p.sql}""")
        val got = cat.read("gold", s"mt$n").collect()
          .map(r => r.getAs[Long]("id") ->
            ((r.getAs[Long]("v"), r.getAs[Long]("w")))).toMap
        assert(got == expected(t, s, p),
          s"program '${p.name}' case $c diverged:\n target=$t\n source=$s\n" +
            s" got=$got\n expected=${expected(t, s, p)}")
        spark.sql(s"DROP TABLE gold.mt$n")
        spark.catalog.dropTempView(s"msrc$n")
      }
    }
  }
}
