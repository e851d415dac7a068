package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TextQueries

/** Property pins for q213 (dump novelty) and q221 (equi-depth
  * histogram): random corpora with heavy text duplication and heavy
  * length ties — the regimes where the first-dump rule and the
  * strict-before bucket rule have teeth — must match sequential
  * in-memory replays exactly. */
class HistNoveltyProps extends SparkSuite {
  import spark.implicits._

  /** (dump, n_docs, n_hashes, n_new, new_tokens, ppm) per dump. */
  private def noveltyModel(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    val perDoc = docs.map { case (id, t) =>
      (id % 4, t, t.trim.split("\\s+").count(_.nonEmpty).toLong)
    }
    val firstDump = perDoc.groupBy(_._2).map { case (t, rs) =>
      t -> rs.map(_._1).min
    }
    perDoc.groupBy(_._1).map { case (dump, rs) =>
      val hashes = rs.map(r => (r._2, r._3)).distinct
      val newH = hashes.filter(h => firstDump(h._1) == dump)
      dump -> ((rs.size.toLong, hashes.size.toLong, newH.size.toLong,
        newH.map(_._2).sum,
        1000000L * newH.size / hashes.size))
    }
  }

  /** (bucket -> (lo, hi, n)) by the strict-before rule, B=8. */
  private def equidepthModel(lengths: Seq[Long])
      : Map[Long, (Long, Long, Long)] = {
    val n = lengths.size.toLong
    val vc = lengths.groupBy(identity).toSeq
      .map { case (v, g) => (v, g.size.toLong) }.sortBy(_._1)
    var cum = 0L
    val rows = vc.map { case (v, c) =>
      val b = math.min(7L, 8L * cum / n); cum += c; (b, v, c)
    }
    rows.groupBy(_._1).map { case (b, g) =>
      b -> ((g.map(_._2).min, g.map(_._2).max, g.map(_._3).sum))
    }
  }

  private val vocab = Vector("ab", "cd", "ef", "gh")

  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(8, 24)
    rows <- Gen.listOfN(n, for {
      copy <- Gen.oneOf(true, false)
      src <- Gen.chooseNum(0, n - 1)
      ws <- Gen.listOfN(5, Gen.chooseNum(0, vocab.size - 1))
    } yield (copy, src, ws))
  } yield {
    val texts = scala.collection.mutable.Buffer.empty[String]
    rows.zipWithIndex.foreach { case ((copy, src, ws), i) =>
      texts += (if (copy && src < i) texts(src) else ws.map(vocab).mkString(" "))
    }
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq
  }

  private def writeDocs(docs: Seq[(Long, String)], tag: String): String = {
    val dir = tmpDir(tag) + "/d"
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q213: distributed dump novelty == sequential first-dump replay") {
    (1 to 5).foreach { c =>
      val docs = corpusGen.apply(Gen.Parameters.default, Seed(911L + c)).get
      val got = TextQueries.dumpNovelty(spark, writeDocs(docs, s"nvp$c"))
        .collect().map(r => r.getAs[Long]("dump") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_hashes"),
            r.getAs[Long]("n_new_hashes"), r.getAs[Long]("new_tokens"),
            r.getAs[Long]("novelty_ppm")))).toMap
      assert(got == noveltyModel(docs), s"case $c: docs=$docs")
    }
  }

  test("q221: distributed equi-depth == sequential strict-before replay " +
      "under heavy length ties") {
    (1 to 5).foreach { c =>
      // lengths drawn from a tiny set so ties straddle boundaries
      val lens = Gen.listOfN(20, Gen.oneOf(40L, 40L, 90L, 150L, 310L))
        .apply(Gen.Parameters.default, Seed(1733L + c)).get
      val docs = lens.zipWithIndex.map { case (l, i) =>
        (i.toLong, Seq.fill((l / 10).toInt)("w").mkString(" "))
      }
      val dir = tmpDir(s"edp$c") + "/d"
      docs.map { case (id, t) => (id, t, "en", "s", lens(id.toInt)) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = TextQueries.equidepthLengths(spark, dir).collect()
        .map(r => r.getAs[Long]("bucket") ->
          ((r.getAs[Long]("lo"), r.getAs[Long]("hi"),
            r.getAs[Long]("n_docs")))).toMap
      assert(got == equidepthModel(lens), s"case $c: lens=$lens")
    }
  }
}
