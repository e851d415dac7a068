package graft

import java.security.MessageDigest

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Dedup

/** Property pin for q210 (fixed-seed scalacheck, the EvalProps pattern):
  * the ENTIRE distributed LSH chain — shingle sets, 12 md5 minhash
  * components, 4 band keys, the train-vs-bench band join, and the
  * integer-ppm verification — must equal a sequential in-memory replay
  * of the same definitions on random corpora. This is stronger than the
  * planted-pair spec: it checks the band keys themselves (a seed or
  * concatenation drift between the Column chain and the documented
  * algorithm would pass "copies are flagged" but fail here for pairs at
  * intermediate similarity, where band membership is selective). */
class FuzzyDecontamProps extends SparkSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Sequential replay of fuzzyDecontam's definitions. */
  private def model(texts: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    def shingles(t: String): Seq[String] = {
      val ws = t.trim.toLowerCase.split("\\s+").toSeq
      if (ws.size >= 3) ws.sliding(3).map(_.mkString(" ")).toSeq.distinct
      else Seq(t.trim.toLowerCase)
    }
    def sig(set: Seq[String], i: Int): String =
      set.map(w => md5hex(s"$i|" + w)).min
    def bands(set: Seq[String]): Set[String] =
      (0 until 4).map { b =>
        val ss = (b * 3 until b * 3 + 3).map(i => sig(set, i))
        md5hex((b.toString +: ss).mkString("|"))
      }.toSet
    val docs = texts.map { case (id, t) =>
      val sh = shingles(t); (id, sh.toSet, sh.size, bands(sh))
    }
    val bench = docs.filter(_._1 % 5 == 0)
    val train = docs.filter(_._1 % 5 != 0)
    (for {
      (tid, ts, tn, tb) <- train
      (bid, bs, bn, bb) <- bench
      if tb.intersect(bb).nonEmpty
      inter = ts.intersect(bs).size.toLong
      j = 1000000L * inter / (tn + bn - inter)
      if j >= 500000L
    } yield (tid, bid, j)).toSet
  }

  private val vocab =
    Vector("sun", "moon", "star", "rain", "wind", "leaf", "rock", "wave")

  /** Corpora with real near-dup structure: fresh word sequences plus
    * mutated copies of earlier docs (one word swapped), so pairs land at
    * intermediate Jaccard where band membership is selective. */
  private val caseGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(8, 18)
    rows <- Gen.sequence[Seq[(Boolean, Int, Seq[Int], Int, Int)],
        (Boolean, Int, Seq[Int], Int, Int)](
      (0 until n).map { _ =>
        for {
          copy <- Gen.oneOf(true, false, false)
          src <- Gen.chooseNum(0, n - 1)
          ws <- Gen.listOfN(7, Gen.chooseNum(0, vocab.size - 1))
          pos <- Gen.chooseNum(0, 6)
          w2 <- Gen.chooseNum(0, vocab.size - 1)
        } yield (copy, src, ws, pos, w2)
      })
  } yield {
    val texts = scala.collection.mutable.Buffer.empty[String]
    rows.zipWithIndex.foreach { case ((copy, src, ws, pos, w2), i) =>
      val base =
        if (copy && src < i) texts(src).split(" ").toSeq
        else ws.map(vocab)
      val t = if (copy && src < i) base.updated(pos, vocab(w2)) else base
      texts += t.mkString(" ")
    }
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq
  }

  test("q210: distributed LSH chain == sequential replay on random corpora") {
    (1 to 5).foreach { c =>
      val texts = caseGen.apply(Gen.Parameters.default, Seed(4243L + c)).get
      val dir = tmpDir(s"fdp$c") + "/d"
      texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = Dedup.fuzzyDecontam(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id"),
          r.getAs[Long]("jaccard_ppm"))).toSet
      assert(got == model(texts), s"case $c: corpus=$texts")
    }
  }
}
