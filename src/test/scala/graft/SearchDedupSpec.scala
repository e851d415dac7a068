package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SearchQueries}

/** Invariants for line-level dedup (q87) and BM25 retrieval (q88) beyond
  * the driver's hash-compare. */
class SearchDedupSpec extends SparkSuite {

  test("lineDedup strikes boilerplate everywhere, keeps unique lines") {
    val out = Dedup.lineDedup(spark, sf0001).cache()
    val rows = out.collect()
    // every doc lost at least the universal header
    assert(rows.forall(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_lines")))
    // no surviving text starts with the synthesized header
    assert(rows.forall(r =>
      !r.getAs[String]("clean_head").startsWith("ALL RIGHTS RESERVED")))
    // header (500 docs), cookie notice (250) and footers (~71 each) all
    // exceed the 10-doc threshold; every body text is unique → exactly the
    // one real line survives per doc
    assert(rows.length == 500)
    assert(rows.forall(r => r.getAs[Long]("n_kept") == 1))
    out.unpersist()
  }

  test("incrementalDedup: cross-generation dups flagged with the lowest " +
      "earlier match; intra-generation pairs are the NEXT batch's problem") {
    import spark.implicits._
    val t = "alpha beta gamma delta epsilon zeta"
    val rows = Seq(
      (0L, t),            // gen 0: seeds the index
      (1L, t),            // gen 1: dup of 0
      (2L, t),            // gen 2: dup of 0 AND 1 -> lowest match wins (0)
      (3L, "three unique words here now one"),        // gen 0, unique
      (4L, "another set of words entirely different"), // gen 1
      (7L, "another set of words entirely different"), // gen 1 = same text
                          // as 4, SAME generation -> not flagged (the
                          // index only holds LOWER generations)
      (5L, "fifth document with its own content")      // gen 2, unique
    ).map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("incdedup") + "/d"
    rows.write.parquet(s"$dir/documents.parquet")
    val out = Dedup.incrementalDedup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("gen"),
        r.getAs[Long]("matched_id"), r.getAs[Long]("jaccard_ppm")))
    assert(out.toSeq == Seq((1L, 1, 0L, 1000000L), (2L, 2, 0L, 1000000L)),
      s"got: ${out.toSeq}")
  }

  test("incrementalDedup: the 100 TB posture (broadcast gate OFF, " +
      "SHUFFLE_HASH everywhere) returns the identical verdict set") {
    val broadcastRows = Dedup.incrementalDedup(spark, sf0001).collect()
      .map(_.toString).sorted.toSeq
    spark.conf.set("graft.dedup.broadcastMaxDocs", "0")
    try {
      val shuffleRows = Dedup.incrementalDedup(spark, sf0001).collect()
        .map(_.toString).sorted.toSeq
      assert(shuffleRows == broadcastRows,
        "flipping the join-strategy gate must never change results")
    } finally spark.conf.unset("graft.dedup.broadcastMaxDocs")
  }

  test("lshPrecisionAudit: all four bands report, verified <= candidates, " +
      "precision is a valid ppm") {
    val out = Dedup.lshPrecisionAudit(spark, sf0001).collect()
    assert(out.map(_.getAs[Int]("band_id")).toSeq == Seq(0, 1, 2, 3),
      s"every band must surface candidates on the planted-dup fixture: " +
        s"${out.toSeq}")
    out.foreach { r =>
      val (c, v, p) = (r.getAs[Long]("n_cand"), r.getAs[Long]("n_verified"),
        r.getAs[Long]("precision_ppm"))
      assert(v <= c && c > 0, s"band ${r.get(0)}: verified $v of $c")
      assert(p >= 0 && p <= 1000000L && p == 1000000L * v / c,
        s"band ${r.get(0)}: precision $p inconsistent with $v/$c")
    }
  }

  test("filterAblation: 6 pairs, intersection bounded by both sides, " +
      "overlap is a valid ppm jaccard") {
    val out = graft.operators.TextQueries.filterAblation(spark, sf0001)
      .collect()
    assert(out.length == 6)
    out.foreach { r =>
      val (na, nb, both, ppm) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_both"), r.getAs[Long]("overlap_ppm"))
      assert(both <= math.min(na, nb),
        s"${r.get(0)}/${r.get(1)}: intersection $both exceeds a side")
      assert(ppm >= 0 && ppm <= 1000000L)
      val union = na + nb - both
      assert(union == 0 && ppm == 0 || ppm == 1000000L * both / union)
    }
    // the pair list is the sorted upper triangle of the 4 filters
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      out.map(r => (r.getString(0), r.getString(1))).toSeq.sorted)
  }

  test("lineDedup can empty a document without dropping its row") {
    // 84 docs: ids 0..69 share one body line (70 > 10 → boilerplate), and
    // with 84 docs every synthesized footer group has 12 docs (> 10), so
    // those docs empty out completely — but stay listed with n_kept = 0
    import spark.implicits._
    val docs = (0 until 84).map { i =>
      (i.toLong, if (i < 70) "same line" else s"unique $i", "en")
    }.toDF("doc_id", "text", "lang")
    val dir = tmpDir("linededup") + "/d"
    docs.write.parquet(s"$dir/documents.parquet")
    val out = Dedup.lineDedup(spark, dir).collect()
    assert(out.length == 84)
    val emptied = out.filter(_.getAs[Long]("doc_id") < 70)
    assert(emptied.forall(r => r.getAs[Long]("n_kept") == 0 &&
      r.getAs[String]("clean_head") == ""))
    val kept = out.filter(_.getAs[Long]("doc_id") >= 70)
    assert(kept.forall(r => r.getAs[Long]("n_kept") == 1))
  }

  test("bm25: more matched terms and higher tf rank higher; k respected") {
    val out = SearchQueries.bm25TopK(spark, sf0001, topK = 10).collect()
    assert(out.length == 10)
    val scores = out.map(_.getAs[Double]("bm25")).toSeq
    assert(scores == scores.sorted.reverse, "must be ranked by score desc")
    assert(out.forall(_.getAs[Long]("n_hits") >= 1))
    // the top hit matches at least as many query terms as the last hit
    assert(out.head.getAs[Long]("n_hits") >= out.last.getAs[Long]("n_hits") ||
      out.head.getAs[Double]("bm25") > out.last.getAs[Double]("bm25"))
  }

  test("bm25 single-term ranking is monotone in tf for equal-length docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat dog bird fish mouse", "en"),   // tf(cat)=1
      (2L, "cat cat bird fish mouse", "en"),   // tf(cat)=2
      (3L, "cat cat cat fish mouse", "en"),    // tf(cat)=3
      (4L, "dog dog bird fish mouse", "en"))   // no match
      .toDF("doc_id", "text", "lang")
    val dir = tmpDir("bm25") + "/d"
    docs.write.parquet(s"$dir/documents.parquet")
    val out = SearchQueries.bm25TopK(spark, dir, terms = Seq("cat"), topK = 10)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(3L, 2L, 1L))
  }

  test("q204 entity resolution: clusters are exactly the planted " +
      "{canonical, variant} pairs — the lev gate rejects block collisions") {
    val rows = graft.operators.Dedup.entityResolution(spark, sf0001)
      .collect()
    assert(rows.nonEmpty && rows.length % 2 == 0)
    val label = rows.map(r =>
      r.getAs[Long]("rid") -> r.getAs[Long]("cluster_id")).toMap
    label.keys.foreach { rid =>
      val partner = if (rid % 2 == 0) rid + 1 else rid - 1
      // every record clusters with its planted partner...
      assert(label(rid) == label(partner),
        s"record $rid split from its planted variant $partner")
      // ...and with NOTHING else: distinct entities differ in >= 2 edits
      // (the entity key is embedded twice), so the cluster id is the
      // even partner — over-merging would show a smaller foreign id here
      assert(label(rid) == (rid / 2) * 2,
        s"record $rid over-merged into cluster ${label(rid)}")
    }
    rows.foreach { r =>
      assert((r.getAs[Int]("is_rep") == 1) ==
        (r.getAs[Long]("rid") == r.getAs[Long]("cluster_id")))
    }
  }

  test("q210 fuzzy decontam: exact copies of bench docs are flagged, " +
      "train-train and bench-bench duplicates are not") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val c = "one two three four five six seven eight"
    val d = "red green blue cyan magenta yellow black white"
    val docs = Seq(
      (0L, a, "en", "s", a.length.toLong),   // bench (0 % 5 == 0)
      (5L, a, "en", "s", a.length.toLong),   // bench copy of bench
      (1L, a, "en", "s", a.length.toLong),   // train copy of bench -> flag
      (2L, c, "en", "s", c.length.toLong),   // train, unrelated
      (3L, d, "en", "s", d.length.toLong),   // train copy of train…
      (4L, d, "en", "s", d.length.toLong))   // …no bench side -> no flag
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("fdec") + "/t"
    docs.write.parquet(s"$dir/documents.parquet")
    val got = Dedup.fuzzyDecontam(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id"),
        r.getAs[Long]("jaccard_ppm"))).toSet
    // doc 1 hits BOTH bench copies at jaccard 1.0; nothing else collides
    assert(got == Set((1L, 0L, 1000000L), (1L, 5L, 1000000L)),
      s"unexpected flags: $got")
  }

  test("q222 cluster sizes: the histogram partitions the corpus and " +
      "matches the underlying components") {
    val hist = Dedup.clusterSizeHistogram(spark, sf0001).collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs")))).toMap
    val docs = graft.Tables.load(spark, sf0001, "documents").count()
    assert(hist.values.map(_._2).sum == docs,
      "every document sits in exactly one cluster")
    hist.foreach { case (size, (nc, nd)) =>
      assert(nd == size * nc, s"size $size: $nd docs != $size * $nc")
    }
    // the planted near-dups guarantee at least one multi-doc cluster
    assert(hist.keys.max >= 2L, s"no dup clusters found: $hist")
  }

  test("q214 threshold sweep: raising the cutoff never admits more " +
      "pairs, and linked docs are bounded by pair endpoints") {
    val rows = Dedup.dedupThresholdSweep(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("threshold_ppm"))
    assert(rows.length == 4)
    assert(rows.head.getAs[Long]("n_pairs") > 0,
      "the fixture's planted near-dups must clear the lowest cutoff")
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("n_pairs") >= hi.getAs[Long]("n_pairs"))
        assert(lo.getAs[Long]("n_docs_linked") >=
          hi.getAs[Long]("n_docs_linked"))
      case _ => ()
    }
    rows.foreach { r =>
      val (p, d) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs_linked"))
      assert(d <= 2 * p, "linked docs cannot exceed pair endpoints")
      assert(p == 0 || d >= 2, "any pair links at least two docs")
    }
  }

  test("q239 source precedence: cross-feed copies keep the trusted " +
      "source, singletons stay out of the audit") {
    import spark.implicits._
    val dir = tmpDir("graft-srcprec")
    val pref = "x" * 40
    Seq(
      (1L, pref + " from the crawl", "src7"),
      (2L, pref + " curated copy", "src2"),
      (3L, pref + " other crawl copy", "src12"),
      (4L, "a unique document body entirely different", "src0"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val out = Dedup.sourcePrecedenceDedup(spark, dir).collect()
    // singleton doc 4 never enters the audit
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    out.foreach { r =>
      // winner is src2 (rank 2 beats 7 and 12 — NUMERIC, not lexical,
      // precedence: src12 must lose to src2)
      assert(r.getAs[Long]("winner_id") == 2L)
      assert(r.getAs[Long]("n_copies") == 3L)
    }
    assert(out.map(r => r.getLong(0) -> r.getAs[Int]("kept")).toMap ==
      Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("q246 leakage-free split: every near-dup cluster lands whole in " +
      "ONE split — no train/test leakage through duplicates") {
    val out = Dedup.leakageFreeSplit(spark, sf0001).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // cluster-atomicity: one split value per cluster
    val perCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
      .view.mapValues(_.map(_.getAs[String]("split")).distinct.length)
    assert(perCluster.values.forall(_ == 1),
      "a cluster straddles splits — the leakage this operator forbids")
    // the split is q90's hash rule applied to the cluster id: members
    // of multi-doc clusters agree with their representative's own split
    val multi = rows.groupBy(_.getAs[Long]("cluster_id"))
      .filter(_._2.length > 1)
    assert(multi.nonEmpty, "fixture has no near-dup clusters — weak test")
    // all three splits appear at fixture scale (hash uniformity sanity)
    assert(rows.map(_.getAs[String]("split")).distinct.sorted.toSeq ==
      Seq("test", "train", "val"))
    out.unpersist()
  }

  test("q247 takedown closure: a named doc removes its whole near-dup " +
      "cluster, untouched clusters retain, singletons resolve directly") {
    import spark.implicits._
    val dir = tmpDir("graft-takedown")
    def body(tail: String) =
      ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3) + tail
    // 11 is named (11 % 29 = 11); 12 is its near-dup (same lang +
    // len_bucket, one-word tail change keeps 3-shingle jaccard high).
    // 50/51 are an untouched near-dup pair; 69 a named singleton
    // (69 % 29 = 11); 70 an untouched singleton.
    Seq(
      (11L, body("one"), "en", 150L), (12L, body("two"), "en", 150L),
      (50L, body("three"), "en", 250L), (51L, body("four"), "en", 250L),
      (69L, "a wholly unique taken-down document body", "en", 100L),
      (70L, "another wholly unrelated retained body", "en", 100L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Dedup.takedownClosure(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got == Map(
      11L -> "removed_direct", 12L -> "removed_duplicate",
      50L -> "retained", 51L -> "retained",
      69L -> "removed_direct", 70L -> "retained"), s"got $got")
  }

  test("q248 ngram novelty: a test doc copied from train reads 100% " +
      "overlap, a disjoint one reads 0, only test docs are scored") {
    import spark.implicits._
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOf(id: Long): String = {
      val h = md5hex(s"$id#split42").substring(0, 4)
      if (h < "e666") "train" else if (h < "f333") "val" else "test"
    }
    val trainId = (1L to 200L).find(splitOf(_) == "train").get
    val testIds = (1L to 200L).filter(splitOf(_) == "test").take(2)
    assert(testIds.length == 2, "need two test-split ids under 200")
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = tmpDir("graft-novelty")
    Seq(
      (trainId, shared),
      (testIds(0), shared), // verbatim copy of a train doc
      (testIds(1), "omega psi chi phi upsilon tau sigma rho"))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = Dedup.ngramNovelty(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("overlap_ppm"))
      .toMap
    assert(got == Map(testIds(0) -> 1000000L, testIds(1) -> 0L),
      s"got $got (train=$trainId test=$testIds)")
  }
}
