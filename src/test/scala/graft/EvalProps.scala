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

  test("fleiss kappa: distributed panel == sequential integer formula") {
    // wider n_chars so rater C (raw length, thresholds 220/420 on the
    // fixture's len = 2·tok − 1) actually spans all three categories
    val gen = for {
      n <- Gen.chooseNum(6, 24)
      rows <- Gen.sequence[Seq[(String, String, Long)], (String, String, Long)](
        (0 until n).map { _ =>
          for {
            lang <- Gen.oneOf("en", "de")
            src <- Gen.oneOf("A", "B", "C")
            nc <- Gen.chooseNum(50L, 4500L)
          } yield (lang, src, nc)
        })
    } yield rows.zipWithIndex.map { case ((lang, src, nc), i) =>
      (i.toLong, lang, src, nc)
    }
    (1 to 5).foreach { c =>
      val rows = gen.apply(Gen.Parameters.default, Seed(4177L + c)).get
      val dir = writeDocs(rows)
      val got = EvalQueries.fleissKappa(spark, dir).collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Long]("p_bar_ppm"), r.getAs[Long]("p_e_ppm"),
            if (r.isNullAt(r.fieldIndex("fleiss_kappa_ppm"))) None
            else Some(r.getAs[Long]("fleiss_kappa_ppm"))))).toMap
      val want = rows.groupBy(_._2).map { case (lang, rs) =>
        val cls = rs.map { case (_, _, _, nc) =>
          val ra = if (nc < 200) 0 else if (nc < 400) 1 else 2
          val tok = (nc / 10) max 1
          val rb = if (tok < 30) 0 else if (tok < 70) 1 else 2
          val len = 2 * tok - 1 // "w" words joined by single spaces
          val rc = if (len < 220) 0 else if (len < 420) 1 else 2
          (ra, rb, rc)
        }
        val n = cls.size.toLong
        val s = cls.map { case (a, b, cc) =>
          2L * (Seq(a == b, a == cc, b == cc).count(identity)) }.sum
        val sc2 = (0 to 2).map { j =>
          val cj = cls.map { case (a, b, cc) =>
            Seq(a, b, cc).count(_ == j).toLong }.sum
          cj * cj
        }.sum
        lang -> ((1000000L * s / (6 * n), 1000000L * sc2 / (9 * n * n),
          if (18 * n * n - 2 * sc2 == 0) None
          else Some(1000000L * (3 * n * s - 2 * sc2) /
            (18 * n * n - 2 * sc2))))
      }
      assert(got == want, s"case $c")
    }
  }

  test("containment dup: distributed inverted-index == sequential brute force") {
    import graft.operators.Dedup
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi")
    val gen = for {
      n <- Gen.chooseNum(40, 60) // 5% df cap = 2-3, so shared grams survive
      texts <- Gen.sequence[Seq[String], String]((0 until n).map { _ =>
        for {
          k <- Gen.chooseNum(1, 6) // 1-2 words exercise the short-doc branch
          ws <- Gen.listOfN(k, Gen.oneOf(vocab))
        } yield ws.mkString(" ")
      })
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    def shingles(t: String): Set[String] = {
      val ws = t.trim.toLowerCase.split("\\s+").toSeq
      if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
      else Set(t.trim.toLowerCase)
    }
    (1 to 5).foreach { c =>
      val docs = gen.apply(Gen.Parameters.default, Seed(5303L + c)).get
      val dir = tmpDir("containprops") + "/d"
      docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = Dedup.containmentDup(spark, dir).collect()
        .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"),
          r.getAs[Long]("shared"), r.getAs[Long]("containment_ppm"),
          r.getAs[Long]("jaccard_ppm"))).toSeq.sorted
      // independent fold: augmentation, shingling, df cap, pair metrics
      val byId = docs.toMap
      val corpus = docs.map { case (id, t) =>
        id -> (if (id % 7 == 0 && byId.contains(id + 1))
          t + " " + byId(id + 1) else t)
      }
      val grams = corpus.map { case (id, t) => id -> shingles(t) }.toMap
      val cap = math.max(1L, docs.size.toLong * 5 / 100)
      val df = grams.values.flatten.groupBy(identity)
        .map { case (g, os) => g -> os.size.toLong }
      val keptG = grams.map { case (id, gs) =>
        id -> gs.filter(g => df(g) <= cap) }
      val want = (for {
        (a, ga) <- keptG.toSeq; (b, gb) <- keptG.toSeq
        if a < b
        shared = (ga & gb).size.toLong
        if shared >= 2
        cont = 1000000L * shared / math.min(ga.size, gb.size)
        if cont >= 800000L
      } yield (a, b, shared, cont,
        1000000L * shared / (ga.size + gb.size - shared))).sorted
      assert(got == want, s"case $c: got=${got.take(8)} want=${want.take(8)}")
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
