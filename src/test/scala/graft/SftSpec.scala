package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.SftQueries

/** SFT/DPO prep invariants beyond the driver's hash-compare: transcript
  * rendering must be partition-order-independent (collect_list arrival
  * order is a race on a cluster — only the explicit struct sort makes it
  * deterministic), and the preference pairer's tiebreaks must produce a
  * usable (distinct) pair even on all-equal cohorts. */
class SftSpec extends SparkSuite {
  import spark.implicits._

  test("chat template: transcript md5 is partition-order independent") {
    val dir = tmpDir("sft1") + "/d"
    val rows = (1L to 200L).map { i =>
      (i, Timestamp.valueOf(f"2024-01-0${1 + (i % 3)}%d 10:${i % 60}%02d:00"),
        i % 7, if (i % 2 == 0) "view" else "click", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val a = SftQueries.chatTemplate(spark, dir).collect()
    assert(a.nonEmpty)
    // same data arriving in a hostile partitioning must render the same
    // transcripts — md5-for-md5
    val shuffled = spark.read.parquet(s"$dir/events.parquet")
      .repartition(7, col("event_id") % 13)
    val dir2 = tmpDir("sft2") + "/d"
    shuffled.write.parquet(s"$dir2/events.parquet")
    val b = SftQueries.chatTemplate(spark, dir2).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "transcript rendering depends on partition arrival order")
  }

  test("chat template: turn roles alternate from the ordered rank") {
    val dir = tmpDir("sft3") + "/d"
    // one user-day, three events with ties on ts broken by event_id
    val ts = Timestamp.valueOf("2024-02-02 09:00:00")
    Seq((10L, ts, 1L, "a", 0.0, "{}"), (11L, ts, 1L, "b", 0.0, "{}"),
      (12L, ts, 1L, "c", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = SftQueries.chatTemplate(spark, dir).collect()
    assert(r.length == 1 && r(0).getAs[Long]("n_turns") == 3L)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("user: a #10\nassistant: b #11\nuser: c #12"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(0).getAs[String]("transcript_md5") == expected,
      "turn order / role parity diverged from (ts, event_id) rank")
  }

  test("preference pairs: all-equal cohort still yields a distinct pair; singletons drop") {
    val dir = tmpDir("sft4") + "/d"
    Seq(
      (1L, "t", "en", "web", 100L), (2L, "t", "en", "web", 100L),
      (3L, "t", "en", "web", 100L), // all-equal cohort of 3
      (4L, "t", "en", "books", 50L), // singleton cohort
      (5L, "t", "de", "web", 10L), (6L, "t", "de", "web", 90L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = SftQueries.preferencePairs(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) ->
        (r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Long]("margin_chars"))).toMap
    // ties: best = lowest id, worst = highest id → a real pair, margin 0
    assert(out(("web", "en")) == ((1L, 3L, 0L)))
    assert(out(("web", "de")) == ((6L, 5L, 80L)))
    assert(!out.contains(("books", "en")), "singleton cohort has no pair")
  }
}
