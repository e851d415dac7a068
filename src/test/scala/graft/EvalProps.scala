package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.EvalQueries

/** Property pins for the q179/q180/q185 integer statistics (fixed-seed
  * scalacheck, the CcProps pattern): for RANDOM document fixtures the
  * distributed join/agg computation must equal a sequential in-memory
  * fold of the SAME integer formulas exactly — any accidental
  * order-dependence (float summation, unstable tiebreak, DIV vs
  * floor-div drift) shows up as a bit mismatch. */
class EvalProps extends SparkSuite {
  import spark.implicits._

  private val B = 1000000000L
  private val T = 1000000000000L

  /** rows: (doc_id, lang, source, n_chars) */
  private def btModel(rows: Seq[(Long, String, String, Long)])
      : Map[String, (Long, Long, Long)] = {
    val docs = rows.map { case (id, lang, src, nc) => (lang, id % 10, src, nc) }
    val games = for {
      a <- docs; b <- docs
      if a._1 == b._1 && a._2 == b._2 && a._3 < b._3
    } yield (a._3, b._3,
      if (a._4 > b._4) 2L else if (a._4 == b._4) 1L else 0L)
    val pair = games.groupBy(g => (g._1, g._2)).toSeq.map {
      case ((p, q), gs) => (p, q, gs.size.toLong, gs.map(_._3).sum)
    }
    val sym = pair.flatMap { case (p, q, n, w) =>
      Seq((p, q, n, w), (q, p, n, 2 * n - w))
    }
    val totals = sym.groupBy(_._1).map { case (pl, rs) =>
      pl -> ((rs.map(_._3).sum, rs.map(_._4).sum))
    }
    var skills: Map[String, Long] = totals.keys.map(_ -> B).toMap
    for (_ <- 1 to 2) {
      val denom = sym.groupBy(_._1).map { case (pl, rs) =>
        pl -> rs.map { case (_, opp, n, _) =>
          n * T / (skills(pl) + skills(opp))
        }.sum
      }
      skills = totals.map { case (pl, (_, wh)) =>
        pl -> (wh + 1) * T / (2 * (denom(pl) + T / (skills(pl) + B)))
      }
    }
    totals.map { case (pl, (ng, wh)) => pl -> ((ng, wh, skills(pl))) }
  }

  private def writeDocs(rows: Seq[(Long, String, String, Long)]): String = {
    val dir = tmpDir("evalprops") + "/d"
    rows.map { case (id, lang, src, nc) =>
      // token count tracks n_chars DIV 10 so rater B is data-dependent
      (id, Seq.fill((nc / 10).toInt max 1)("w").mkString(" "), lang, src, nc)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private val caseGen = for {
    n <- Gen.chooseNum(6, 24)
    rows <- Gen.sequence[Seq[(String, String, Long)], (String, String, Long)](
      (0 until n).map { _ =>
        for {
          lang <- Gen.oneOf("en", "de")
          src <- Gen.oneOf("A", "B", "C", "D", "E")
          nc <- Gen.chooseNum(50L, 450L)
        } yield (lang, src, nc)
      })
  } yield rows.zipWithIndex.map { case ((lang, src, nc), i) =>
    (i.toLong, lang, src, nc)
  }

  test("bradley-terry: distributed MM == sequential integer fold") {
    (1 to 5).foreach { c =>
      val rows = caseGen.apply(Gen.Parameters.default, Seed(977L + c)).get
      val dir = writeDocs(rows)
      val got = EvalQueries.bradleyTerry(spark, dir).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == btModel(rows), s"case $c: rows=$rows")
    }
  }

  test("kappa: distributed contingency == sequential integer formula") {
    (1 to 5).foreach { c =>
      val rows = caseGen.apply(Gen.Parameters.default, Seed(1313L + c)).get
      val dir = writeDocs(rows)
      val got = EvalQueries.raterAgreement(spark, dir).collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(r.fieldIndex("kappa_ppm"))) None
           else Some(r.getAs[Long]("kappa_ppm")))).toMap
      val want = rows.groupBy(_._2).map { case (lang, rs) =>
        val cls = rs.map { case (_, _, _, nc) =>
          val ra = if (nc < 200) 0 else if (nc < 400) 1 else 2
          val tok = (nc / 10) max 1 // the fixture's token count
          val rb = if (tok < 30) 0 else if (tok < 70) 1 else 2
          (ra, rb)
        }
        val n = cls.size.toLong
        val agree = cls.count(p => p._1 == p._2).toLong
        val s = (0 to 2).map(k => cls.count(_._1 == k).toLong *
          cls.count(_._2 == k).toLong).sum
        lang -> (if (n * n == s) None
                 else Some(1000000L * (n * agree - s) / (n * n - s)))
      }
      assert(got == want, s"case $c")
    }
  }

  test("chi2 drift: distributed table == sequential integer formula") {
    (1 to 5).foreach { c =>
      val rows = caseGen.apply(Gen.Parameters.default, Seed(2025L + c)).get
      val dir = writeDocs(rows)
      val got = EvalQueries.chi2Drift(spark, dir).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("chi2_ppm")).toMap
      val n = rows.size.toLong
      val cOld = rows.count(_._1 % 2 == 0).toLong
      val cNew = n - cOld
      val want = rows.groupBy(_._3).map { case (src, rs) =>
        val oOld = rs.count(_._1 % 2 == 0).toLong
        val oNew = rs.size - oOld
        val eOld = rs.size * cOld / n
        val eNew = rs.size * cNew / n
        src -> (1000000L * (oOld - eOld) * (oOld - eOld) / (eOld max 1L) +
          1000000L * (oNew - eNew) * (oNew - eNew) / (eNew max 1L))
      }
      assert(got == want, s"case $c")
    }
  }
}
