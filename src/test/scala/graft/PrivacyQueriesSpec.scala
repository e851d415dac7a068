package graft

import org.apache.spark.sql.functions._

import graft.operators.PrivacyQueries

/** The q236 local-DP randomized-response release, proven against an
  * EXACT sequential replay of the mechanism: the same seeded md5 coins,
  * the same 1+j rotation, the same clamped integer estimator, folded in
  * plain Scala over the fixture rows. The distributed release must
  * reproduce the fold bit-for-bit — any drift in the coin slices, the
  * label indexing, or the estimator arithmetic is a hard failure, not a
  * statistical one. (The audits q157/q218/q230 keep their invariants in
  * TextOpsSpec, where they lived before the PrivacyQueries split.)
  */
class PrivacyQueriesSpec extends SparkSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The mechanism + estimator, folded sequentially — the oracle. */
  private def replay(rows: Seq[(Long, String)])
      : Seq[(String, Long, Long, Long, Long)] = {
    val labels = rows.map(_._2).distinct.sorted
    val k = labels.length
    val idx = labels.zipWithIndex.toMap
    val n = rows.length.toLong
    val reported = rows.map { case (id, lang) =>
      val h = md5hex(s"$id#rr42")
      val i = idx(lang)
      if (h.substring(0, 4) < "c000") i
      else {
        val j = Integer.parseInt(h.substring(4, 8), 16) % (k - 1)
        (i + 1 + j) % k
      }
    }
    val obs = reported.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    labels.map { lang =>
      val o = obs.getOrElse(idx(lang), 0L)
      val est = math.max(0L, 4L * (k - 1) * o - n) / (3L * k - 4)
      (lang, truth(lang), o, est, math.abs(est - truth(lang)))
    }
  }

  test("q236 equals the sequential mechanism fold on a skewed fixture") {
    val langs = Seq("en", "de", "fr", "zh")
    // skewed: en-heavy so the debiased estimate has real work to do
    val rows = (0L until 400L).map { id =>
      (id, langs((id % 10) match {
        case 0 | 1 | 2 | 3 | 4 | 5 => 0
        case 6 | 7 => 1
        case 8 => 2
        case _ => 3
      }))
    }
    val dir = tmpDir("graft-rr")
    rows.toDF("doc_id", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PrivacyQueries.randomizedResponse(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == replay(rows),
      s"distributed release diverged from the sequential fold:\n$got")
    // the release is a real randomization: observed counts moved off the
    // truth (p = 3/4 keeps, so ~10% of an en-heavy corpus flips out)
    assert(got.exists { case (_, t, o, _, _) => t != o },
      "mechanism applied no noise — coins broken")
    // conservation: both the true and the reported histograms cover n
    assert(got.map(_._2).sum == 400L && got.map(_._3).sum == 400L)
  }

  test("q236 on the driver fixture: conservation + estimator sanity") {
    val out = PrivacyQueries.randomizedResponse(spark, sf0001).collect()
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(out.map(_.getAs[Long]("true_n")).sum == n)
    assert(out.map(_.getAs[Long]("obs_n")).sum == n)
    out.foreach { r =>
      assert(r.getAs[Long]("est_n") >= 0L)
      assert(r.getAs[Long]("abs_err") ==
        math.abs(r.getAs[Long]("est_n") - r.getAs[Long]("true_n")))
    }
    // deterministic: the seeded mechanism replays identically
    val again = PrivacyQueries.randomizedResponse(spark, sf0001).collect()
    assert(out.toSeq == again.toSeq)
  }
}
