package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.LmQueries

/** Property pins for the q200/q201/q203 LM/eval statistics (fixed-seed
  * scalacheck, the EvalProps pattern): for RANDOM small corpora the
  * distributed computation must equal a sequential in-memory fold of the
  * SAME integer formulas exactly — any order-dependence (float summation,
  * unstable window tiebreak, DIV vs floor-div drift) is a bit mismatch. */
class LmProps extends SparkSuite {
  import spark.implicits._

  /** rows: (doc_id, source, words) */
  private type Docs = Seq[(Long, String, Seq[String])]

  private def writeDocs(rows: Docs): String = {
    val dir = tmpDir("lmprops") + "/d"
    rows.map { case (id, src, ws) =>
      (id, ws.mkString(" "), "en", src, ws.mkString(" ").length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private val caseGen: Gen[Docs] = for {
    n <- Gen.chooseNum(4, 14)
    rows <- Gen.sequence[Seq[(String, Seq[String])], (String, Seq[String])](
      (0 until n).map { _ =>
        for {
          src <- Gen.oneOf("A", "B", "C")
          len <- Gen.chooseNum(1, 10)
          ws <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
        } yield (src, ws)
      })
  } yield rows.zipWithIndex.map { case ((src, ws), i) => (i.toLong, src, ws) }

  private def backoffModel(rows: Docs)
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    val train = rows.filter(_._1 % 2 == 0)
    val uni = train.flatMap(_._3).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val bg = train.flatMap { case (_, _, ws) =>
      if (ws.size < 2) Nil else ws.sliding(2).map(p => (p(0), p(1))).toSeq
    }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val n = uni.values.sum
    rows.map { case (id, _, ws) =>
      val scored = ws.zipWithIndex.map { case (w, i) =>
        val w1 = if (i == 0) None else Some(ws(i - 1))
        if (!uni.contains(w)) (0L, 1L, 0L)
        else w1 match {
          case None => (1000000L * uni(w) / n, 0L, 0L)
          case Some(p) => bg.get((p, w)) match {
            case Some(c) => (1000000L * c / uni(p), 0L, 0L)
            case None => (400000L * uni(w) / n, 0L, 1L)
          }
        }
      }
      val sum = scored.map(_._1).sum
      id -> ((ws.size.toLong, scored.map(_._2).sum, scored.map(_._3).sum,
        sum, sum / ws.size))
    }.toMap
  }

  private def grams(ws: Seq[String], n: Int): Map[String, Long] =
    (if (ws.size < n) Nil
     else ws.sliding(n).map(_.mkString(" ")).toSeq)
      .groupBy(identity).map { case (g, o) => g -> o.size.toLong }

  private def bleuModel(rows: Docs)
      : Map[(Long, Long), Seq[Option[Long]]] = {
    val bySrc = rows.groupBy(_._2).values.flatMap { docs =>
      val sorted = docs.sortBy(_._1)
      sorted.zip(sorted.drop(1)).map { case (ref, cand) =>
        (cand._1, ref._1, cand._3, ref._3)
      }
    }
    bySrc.map { case (cid, rid, cw, rw) =>
      def clip(n: Int): (Long, Long) = {
        val (cg, rg) = (grams(cw, n), grams(rw, n))
        (cg.values.sum, cg.map { case (g, c) =>
          math.min(c, rg.getOrElse(g, 0L)) }.sum)
      }
      val (c1, clip1) = clip(1); val (c2, clip2) = clip(2)
      val r1 = rw.size.toLong
      val r2 = if (rw.size < 2) 0L else (rw.size - 1).toLong
      val p1 = 1000000L * clip1 / c1
      val rouge1 = 1000000L * clip1 / r1
      val p2 = if (c2 > 0) Some(1000000L * clip2 / c2) else None
      val rouge2 = if (r2 > 0) Some(1000000L * clip2 / r2) else None
      val bp = math.min(1000000L, 1000000L * c1 / r1)
      val bleu2 = p2.map(p => bp * (p1 * p / 1000000L) / 1000000L)
      (cid, rid) -> Seq(Some(c1), Some(r1), Some(clip1), Some(c2),
        Some(r2), Some(clip2), Some(p1), Some(rouge1), p2, rouge2,
        Some(bp), bleu2)
    }.toMap
  }

  private def tvModel(rows: Docs): Map[(String, String), (Long, Long)] = {
    val bySrc = rows.groupBy(_._2).map { case (s, docs) =>
      val ws = docs.flatMap(_._3)
      val n = ws.size.toLong
      s -> ws.groupBy(identity).map { case (w, g) =>
        w -> 1000000000L * g.size / n }
    }
    val srcs = bySrc.keys.toSeq.sorted
    (for {
      a <- srcs; b <- srcs if a < b
    } yield {
      val (pa, pb) = (bySrc(a), bySrc(b))
      val sharedW = pa.keySet.intersect(pb.keySet)
      val d = sharedW.toSeq.map(w => math.abs(pa(w) - pb(w))).sum
      val missA = pa.values.sum - sharedW.toSeq.map(pa).sum
      val missB = pb.values.sum - sharedW.toSeq.map(pb).sum
      (a, b) -> ((sharedW.size.toLong, (d + missA + missB) / 2))
    }).toMap
  }

  test("q200: distributed stupid backoff == sequential integer fold") {
    (1 to 5).foreach { c =>
      val rows = caseGen.apply(Gen.Parameters.default, Seed(4177L + c)).get
      val dir = writeDocs(rows)
      val got = LmQueries.backoffLm(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      assert(got == backoffModel(rows), s"case $c: rows=$rows")
    }
  }

  test("q201: distributed clipped BLEU/ROUGE == sequential fold") {
    (1 to 5).foreach { c =>
      val rows = caseGen.apply(Gen.Parameters.default, Seed(5519L + c)).get
      val dir = writeDocs(rows)
      val got = LmQueries.bleuRouge(spark, dir).collect().map { r =>
        (r.getLong(r.fieldIndex("cand_id")),
          r.getLong(r.fieldIndex("ref_id"))) ->
          Seq("c1", "r1", "clip1", "c2", "r2", "clip2", "p1_ppm",
            "rouge1_ppm", "p2_ppm", "rouge2_ppm", "bp_ppm", "bleu2_ppm")
            .map(f => if (r.isNullAt(r.fieldIndex(f))) None
                      else Some(r.getLong(r.fieldIndex(f))))
      }.toMap
      assert(got == bleuModel(rows), s"case $c: rows=$rows")
    }
  }

  test("q203: distributed TV distance == sequential fold") {
    (1 to 5).foreach { c =>
      val rows = caseGen.apply(Gen.Parameters.default, Seed(6673L + c)).get
      val dir = writeDocs(rows)
      val got = LmQueries.sourceTv(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      assert(got == tvModel(rows), s"case $c: rows=$rows")
    }
  }
}
