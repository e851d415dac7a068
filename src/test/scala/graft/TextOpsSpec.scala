package graft

import org.apache.spark.sql.functions._

import graft.operators.{MixQueries, PrivacyQueries, TextQueries}

/** The corners of the round-4 text operators the fixture corpus cannot
  * reach: CJK counting on real CJK text, PII patterns on real PII shapes,
  * and the replication-weight semantics of mixture upsampling. */
class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("script classes count real CJK and mixed text correctly") {
    val df = Seq(
      (1L, "汉字文本 abc 12"),
      (2L, "pure latin words"),
      (3L, "唯一汉字")).toDF("doc_id", "text")
      .select(col("doc_id"),
        regexp_count(col("text"), lit("[A-Za-z]")).as("n_latin"),
        regexp_count(col("text"), lit("[0-9]")).as("n_digit"),
        regexp_count(col("text"), lit("[一-鿿]")).as("n_cjk"))
    val got = df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Int]("n_latin"), r.getAs[Int]("n_digit"),
        r.getAs[Int]("n_cjk"))).toMap
    assert(got(1L) == ((3, 2, 4)), s"mixed text: ${got(1L)}")
    assert(got(2L) == ((14, 0, 0)))
    assert(got(3L) == ((0, 0, 4)))
  }

  test("PII patterns match and redact real PII shapes, innermost first") {
    val text = "mail jo.doe+x@corp.example.org or call +49-30-1234567 " +
      "from 192.168.0.17 twice 192.168.0.18"
    val df = Seq((1L, text)).toDF("doc_id", "text")
      .select(
        regexp_count(col("text"), lit(TextQueries.EmailRe)).as("e"),
        regexp_count(col("text"), lit(TextQueries.PhoneRe)).as("p"),
        regexp_count(col("text"), lit(TextQueries.Ipv4Re)).as("i"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), TextQueries.EmailRe, "<EMAIL>"),
            TextQueries.PhoneRe, "<PHONE>"),
          TextQueries.Ipv4Re, "<IP>").as("red"))
    val r = df.collect()(0)
    assert(r.getAs[Int]("e") == 1 && r.getAs[Int]("p") == 1 &&
      r.getAs[Int]("i") == 2)
    assert(r.getAs[String]("red") ==
      "mail <EMAIL> or call <PHONE> from <IP> twice <IP>")
  }

  test("nfc_normalize: native expression composes, idempotent, SQL-addressable") {
    import graft.functions.TextNormalize
    val df = Seq(
      (1L, "café"), (2L, "café"), (3L, "Ångström"),
      (4L, "plain"), (5L, null)).toDF("id", "t")
      .select(col("id"), TextNormalize.nfc(col("t")).as("n"),
        TextNormalize.cleanText(concat(lit(" a \t "), col("t"))).as("c"))
    val got = df.collect().map(r => r.getLong(0) ->
      (r.getAs[String]("n"), r.getAs[String]("c"))).toMap
    assert(got(1L)._1 == "café" && got(2L)._1 == "café",
      s"decomposed and composed must converge: $got")
    assert(got(3L)._1 == "Ångström")
    assert(got(4L)._1 == "plain" && got(5L)._1 == null)
    assert(got(1L)._2 == "a café", s"cleanup: '${got(1L)._2}'")
    assert(got(5L)._2 == null)
    // registered SQL surface (plain-session registration path)
    graft.functions.GraftExtensions.register(spark)
    assert(spark.sql("SELECT nfc_normalize('café') AS n")
      .head().getString(0) == "café")
  }

  test("chunking covers every token, overlaps by window-stride, clamps the tail") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    val docs = Seq(
      (1L, (1 to 200).map(i => s"w$i").mkString(" "), "en"), // 4 chunks
      (2L, "just a few tokens", "en"),                       // 1 chunk
      (3L, (1 to 64).map(i => s"x$i").mkString(" "), "en"))  // exactly W -> 1
      .toDF("doc_id", "text", "lang")
    docs.write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.chunkDocuments(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(out(2L).length == 1 && out(3L).length == 1)
    assert(out(2L)(0).getAs[String]("chunk_text") == "just a few tokens")
    val c1 = out(1L).sortBy(_.getAs[Long]("chunk_id"))
    // starts 1, 49, 97, 145; interior chunks 64 tokens, tail clamps to 56
    assert(c1.map(_.getAs[Long]("start_token")).toSeq == Seq(1L, 49L, 97L, 145L))
    assert(c1.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(64L, 64L, 64L, 56L))
    // every token index covered, consecutive chunks overlap by exactly 16
    val covered = c1.flatMap { r =>
      val s = r.getAs[Long]("start_token")
      s until (s + r.getAs[Long]("n_chunk_tokens"))
    }.toSet
    assert(covered == (1L to 200L).toSet)
    assert(c1.sliding(2).forall { case Array(a, b) =>
      a.getAs[Long]("start_token") + 64 - b.getAs[Long]("start_token") == 16
    })
    // chunk text is the real token slice (spot-check the tail chunk)
    assert(c1.last.getAs[String]("chunk_text") ==
      (145 to 200).map(i => s"w$i").mkString(" "))
  }

  test("mixture upsampling replicates by floor(weight) plus a deterministic fraction") {
    val out = MixQueries.mixUpsample(spark, sf0001)
    val docs = Tables.load(spark, sf0001, "documents")
    val copies = out.groupBy("doc_id", "lang")
      .agg(max("copy_no").as("n"), count(lit(1)).as("c"))
    // copy_no is dense 1..n per doc
    assert(copies.filter(col("n") =!= col("c")).count() == 0)
    val byLang = copies.groupBy("lang")
      .agg(min("n").as("lo"), max("n").as("hi"))
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Int]("lo"), r.getAs[Int]("hi"))).toMap
    // fr weight 1.0 → exactly one copy; es 2.0 → exactly two;
    // de 2.5 → two or three; en 0.3 / zh 0.7 → the kept docs have one
    assert(byLang("fr") == ((1, 1)) && byLang("es") == ((2, 2)))
    assert(byLang("de")._1 >= 2 && byLang("de")._2 <= 3)
    assert(byLang.get("en").forall(_ == ((1, 1))))
    // determinism: a re-run replicates the same docs the same number of times
    assert(rowsOf(MixQueries.mixUpsample(spark, sf0001), "doc_id", "copy_no")
      == rowsOf(out, "doc_id", "copy_no"))
    // sub-1.0 strata actually dropped some docs
    val enAll = docs.filter(col("lang") === "en").count()
    val enKept = out.filter(col("lang") === "en")
      .select("doc_id").distinct().count()
    assert(enKept > 0 && enKept < enAll)
  }

  test("writeShards lays each shard out in training order without a global sort") {
    val out = tmpDir("graft-shards") + "/corpus"
    TextQueries.writeShards(spark, sf0001, out)
    val docs = Tables.load(spark, sf0001, "documents")
    val assign = TextQueries.shardShuffle(spark, sf0001)
    // every doc lands in exactly one shard; shards cover 0..15
    assert(assign.count() == docs.count())
    val shards = assign.select("shard").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(shards.head >= 0 && shards.last <= 15 && shards.length > 1)
    // the written layout agrees with the assignment...
    val written = spark.read.parquet(out)
    assert(rowsOf(written.select(col("doc_id"), col("shard").cast("long"),
      col("pos")), "doc_id", "shard", "pos")
      == rowsOf(assign, "doc_id", "shard", "pos"))
    // ...and each shard directory is PHYSICALLY in training order: the
    // parquet row order (no ORDER BY on read) is pos-ascending
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shardDirs = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val pos = spark.read.parquet(d.getPath.toString)
        .select("pos").collect().map(_.getLong(0))
      assert(pos.sameElements(pos.sorted),
        s"${d.getPath.getName} not in training order")
    }
    // a re-run reproduces the identical assignment (pure function of id)
    assert(rowsOf(TextQueries.shardShuffle(spark, sf0001),
      "doc_id", "shard", "pos") == rowsOf(assign, "doc_id", "shard", "pos"))
    // the scale path: more hex digits refine the SAME partition — the
    // high nibble of a 2-digit shard is the 1-digit shard, so growing
    // the shard count never reassigns a doc across coarse shards
    val fine = TextQueries.shardShuffle(spark, sf0001, hexDigits = 2)
    assert(fine.count() == docs.count())
    assert(fine.agg(min("shard"), max("shard")).collect()
      .headOption.forall(r => r.getLong(0) >= 0 && r.getLong(1) <= 255))
    val mismatch = fine.select(col("doc_id"), (col("shard") / 16)
        .cast("long").as("coarse"))
      .join(assign.select(col("doc_id"), col("shard").as("s1")), "doc_id")
      .filter(col("coarse") =!= col("s1")).count()
    assert(mismatch == 0, s"$mismatch docs moved across coarse shards")
  }

  test("unimax: epoch cap binds small languages, leftover spreads over large ones") {
    import spark.implicits._
    val dir = tmpDir("unimax") + "/d"
    // planted sizes via word counts: tiny=2 words/doc × 5 docs = 10
    // tokens; mid = 100; big = 1000. budget = 0.6·1110 = 666
    val docs =
      (1L to 5L).map(i => (i, "w w", "tiny")) ++
      (6L to 15L).map(i => (i, Seq.fill(10)("w").mkString(" "), "mid")) ++
      (16L to 25L).map(i => (i, Seq.fill(100)("w").mkString(" "), "big"))
    docs.toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val out = MixQueries.unimaxMix(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // tiny: cap 3·10 = 30 < 666/3 = 222 → fully capped, 3.0 epochs
    assert(out("tiny") == ((10L, 30L, 3000000L)))
    // mid: cap 300 < (666-30)/2 = 318 → capped
    assert(out("mid") == ((100L, 300L, 3000000L)))
    // big: gets the rest, under its cap: 636-300 = 336 → 0.336 epochs
    assert(out("big") == ((1000L, 336L, 336000L)))
    // conservation: total allocation never exceeds the budget
    assert(out.values.map(_._2).sum <= 1110L * 6 / 10)
  }

  test("cdc_chunks: lossless cover, reference hash cuts, shift resilience, SQL name") {
    import graft.functions.CdcChunksExpr.cdcChunks
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog " * 8,
      "短文 mixed 多字节 text with 中文 characters interleaved " * 6,
      "tiny", "", "exactly8")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val got = df.select(col("id"), cdcChunks(col("t")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // chunks concatenate back to the text, in order, all nonempty
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong).mkString == t, s"text $i not covered")
      if (t.nonEmpty) assert(got(i.toLong).forall(_.nonEmpty))
      else assert(got(i.toLong).isEmpty)
    }
    // cuts equal an independent reference fold over code points
    def refCuts(t: String): Seq[Int] = {
      val cps = t.codePoints().toArray
      (0 to cps.length - 8).flatMap { k =>
        val h = (1 until 8).foldLeft(cps(k).toLong)((a, j) =>
          (a * 131L + cps(k + j)) % 1000000007L)
        if (h % 32 == 0) Some(k + 8) else None
      }
    }
    texts.filter(_.length >= 8).foreach { t =>
      val i = texts.indexOf(t).toLong
      val boundsGot = got(i).scanLeft(0)((acc, c) =>
        acc + c.codePoints().toArray.length).tail.dropRight(1)
      val expect = refCuts(t).filter(_ < t.codePoints().toArray.length)
      assert(boundsGot == expect,
        s"cuts diverged for '${t.take(30)}…': $boundsGot vs $expect")
    }
    // content-defined property: a prefix insertion leaves the chunk
    // stream identical once past the insertion's neighborhood
    val base = "abcdefgh ijklmnop qrstuvwx " * 10
    val shifted = "INSERTED-PREFIX " + base
    val c1 = df.sparkSession.range(1).select(
      cdcChunks(lit(base))).collect()(0).getSeq[String](0)
    val c2 = df.sparkSession.range(1).select(
      cdcChunks(lit(shifted))).collect()(0).getSeq[String](0)
    val common = c1.reverse.zip(c2.reverse).takeWhile { case (a, b) => a == b }
    assert(c1.length > 2 && common.length >= c1.length - 2,
      s"chunking is not content-defined: only ${common.length} common " +
        s"tail chunks of ${c1.length}")
    // SQL surface via GraftExtensions.register
    graft.functions.GraftExtensions.register(spark)
    df.createOrReplaceTempView("cdc_t")
    val viaSql = spark.sql("SELECT id, cdc_chunks(t) AS c FROM cdc_t")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(texts.indices.forall(i => viaSql(i.toLong) == got(i.toLong)))
  }

  test("q206 mixture rebalance: distributed MW rounds equal the " +
      "sequential integer fold, and shares move toward the target") {
    val rows = MixQueries.mixtureRebalance(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // rebuild the same arithmetic sequentially from the per-domain stats
    val base = rows.map { r =>
      (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("mean_chars"))
    }
    val nTotal = base.map(_._2).sum
    val nDom = base.length
    val t = 1000000000L / nDom
    var w = base.map { case (_, c, mc) =>
      (1000000000L * c / nTotal, 1L + mc % 7L)
    }
    for (_ <- 1 to 3) {
      val sW = w.map(_._1).sum
      w = w.map { case (wi, d) =>
        (wi + (wi * d * (t - (1000000000L * wi / sW))) / 8000000000L, d)
      }
    }
    val sF = w.map(_._1).sum
    val expect = base.map(_._1).zip(w).map { case (src, (wi, _)) =>
      src -> (wi, 1000000000L * wi / sF)
    }.toMap
    rows.foreach { r =>
      val (wi, share) = expect(r.getAs[String]("source"))
      assert(r.getAs[Long]("weight_raw") == wi,
        s"weight diverged for ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("share_ppb") == share)
    }
    // the sf0.001 fixture's sources are near-uniform (startDist ~ 0), so
    // prove the loop does WORK on a deliberately skewed corpus: shares
    // must move strictly toward the uniform target
    val dir = tmpDir("mw-skew") + "/d"
    (1L to 90L).map(i =>
      (i, "t " * 20, "en", if (i <= 60) "big" else if (i <= 80) "mid"
       else "small", 40L + i % 7))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val skew = MixQueries.mixtureRebalance(spark, dir).collect()
    val tSkew = 1000000000L / skew.length
    val startDist = Seq(60L, 20L, 10L).map(c =>
      math.abs(1000000000L * c / 90L - tSkew)).sum
    val endDist = skew.map(r =>
      math.abs(r.getAs[Long]("share_ppb") - tSkew)).sum
    assert(endDist < startDist,
      s"rebalance did not move toward target: $startDist -> $endDist")
  }

  test("q208 water-filling: matches the sequential fold; caps respected; " +
      "slack redistributes to unsaturated domains") {
    val rows = MixQueries.budgetWaterfill(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val supply = rows.map(r =>
      r.getAs[String]("source") -> r.getAs[Long]("supply")).toMap
    // sequential replay of the same integer arithmetic
    var alloc = supply.view.mapValues(_ => 0L).toMap
    val cap = supply.view.mapValues(_ * 4).toMap
    val budget = supply.values.sum * 2
    for (_ <- 1 to 3) {
      val remaining = budget - alloc.values.sum
      val active = alloc.keys.filter(k => alloc(k) < cap(k)).toSeq
      val share = remaining / math.max(1, active.size)
      alloc = alloc.map { case (k, a) =>
        k -> (if (a < cap(k)) a + math.min(cap(k) - a, share) else a)
      }
    }
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("alloc") == alloc(s),
        s"allocation diverged from the sequential fold for $s")
      assert(r.getAs[Long]("alloc") <= cap(s), s"cap violated for $s")
      assert((r.getAs[Int]("saturated") == 1) ==
        (r.getAs[Long]("alloc") >= cap(s)))
    }
    // the budget is binding: everything allocated stays within it, and
    // unsaturated domains absorbed more than a flat equal split would
    // have given them iff someone saturated
    assert(rows.map(_.getAs[Long]("alloc")).sum <= budget)
    if (rows.exists(_.getAs[Int]("saturated") == 1)) {
      val flat = budget / rows.length
      assert(rows.filter(_.getAs[Int]("saturated") == 0)
        .forall(_.getAs[Long]("alloc") >= flat),
        "saturated domains' slack must flow to the unsaturated ones")
    }
  }

  test("q207 PR curve: counting identities and monotone operating points") {
    val rows = graft.operators.SearchQueries.prCurve(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("bin"))
    assert(rows.nonEmpty)
    val totalPos = rows.head.getAs[Long]("tp") + rows.head.getAs[Long]("fn")
    rows.foreach { r =>
      assert(r.getAs[Long]("admitted") ==
        r.getAs[Long]("tp") + r.getAs[Long]("fp"))
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == totalPos,
        "tp+fn must be the fixed positive total at every threshold")
    }
    // lowering the threshold (smaller bin) admits more and never loses
    // recall
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("admitted") >= hi.getAs[Long]("admitted"))
        assert(lo.getAs[Long]("recall_ppm") >= hi.getAs[Long]("recall_ppm"))
      case _ => ()
    }
  }

  test("q211 domain blocklist: parent rules match subdomains and the " +
      "most specific rule wins") {
    val docs = Seq(
      (7L, "t", "en", "src1", 1L),   // h7.src1  -> host rule beats parent
      (1L, "t", "en", "src1", 1L),   // h1.src1  -> parent rule
      (3L, "t", "en", "src3", 1L),   // h3.src3  -> parent rule
      (2L, "t", "en", "src2", 1L))   // h2.src2  -> unblocked
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("blk") + "/t"
    docs.write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.domainBlocklist(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("blocked_by"))
      .toMap
    assert(got == Map(
      7L -> "h7.src1.example.com",   // longest match, not src1.example.com
      1L -> "src1.example.com",
      3L -> "src3.example.com"), s"got $got")
  }

  test("q212 curation funnel: stages are cumulative and each gate " +
      "matches its single-stage operator") {
    val rows = MixQueries.curationFunnel(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("stage"))
    assert(rows.map(_.getAs[String]("stage_name")).toSeq ==
      Seq("raw", "exact_dedup", "quality", "language", "decontaminated"))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_docs") >= b.getAs[Long]("n_docs"))
        assert(a.getAs[Long]("n_tokens") >= b.getAs[Long]("n_tokens"))
      case _ => ()
    }
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") % 97 =!= 0).cache()
    assert(rows(0).getAs[Long]("n_docs") == docs.count(),
      "stage 1 must count every non-bench doc")
    assert(rows(1).getAs[Long]("n_docs") ==
      docs.select(md5(col("text"))).distinct().count(),
      "the dedup stage must keep one doc per distinct text")
    docs.unpersist()
  }

  test("q215 quota split: allocations sum EXACTLY to the eval budget " +
      "and each cell gets at most one spare seat") {
    val rows = MixQueries.quotaSplit(spark, sf0001).collect()
    val total = graft.Tables.load(spark, sf0001, "documents").count()
    assert(rows.map(_.getAs[Long]("alloc")).sum == total / 10,
      "largest-remainder allocation must hit the budget exactly")
    rows.foreach { r =>
      assert(r.getAs[Long]("extra") == 0L || r.getAs[Long]("extra") == 1L)
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("n_docs"),
        "a cell cannot be allocated more docs than it has")
    }
  }

  test("q221 equi-depth histogram: buckets tile the value range in " +
      "order and hold balanced counts up to tie overflow") {
    val rows = TextQueries.equidepthLengths(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("bucket"))
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    assert(rows.nonEmpty && rows.length <= 8)
    // contiguous, ordered, non-overlapping ranges
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"),
          "bucket ranges must not overlap")
      case _ => ()
    }
    // counts are conserved and every bucket id is in range; balance
    // itself is NOT pinned — a tie straddling a boundary legitimately
    // over/under-fills neighbors (the fixture-dependence trap)
    assert(n == graft.Tables.load(spark, sf0001, "documents").count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 7)
      assert(r.getAs[Long]("lo") <= r.getAs[Long]("hi"))
    }
  }

  test("q220 rendezvous reshard: every moved doc lands on the NEW " +
      "shard and movement is near the 1/(N+1) minimum") {
    val rows = MixQueries.rendezvousReshard(spark, sf0001).collect()
    rows.foreach { r =>
      val (o, n, m) = (r.getAs[Long]("shard_old"),
        r.getAs[Long]("shard_new"), r.getAs[Int]("moved"))
      assert((m == 1) == (o != n))
      // the minimal-movement property: a doc only moves when the ADDED
      // shard (id 8) wins its rendezvous — never shard-to-shard churn
      if (m == 1) assert(n == 8L, s"doc churned between old shards: $r")
      assert(o >= 0 && o < 8 && n >= 0 && n <= 8)
    }
    // expected moved ≈ docs/9 (11.1%); generous ±4σ binomial band
    val moved = rows.count(_.getAs[Int]("moved") == 1)
    val exp = rows.length / 9.0
    val sd = math.sqrt(rows.length * (1.0 / 9) * (8.0 / 9))
    assert(math.abs(moved - exp) <= 4 * sd,
      s"movement rate far from the 1/(N+1) minimum: $moved of ${rows.length}")
  }

  test("q218 l-diversity: homogeneous cells are flagged and the " +
      "dominant share is exact") {
    // cell A (src "a", bucket 0): 3 en + 1 de -> diverse, dominant 750000
    // cell B (src "b", bucket 0): 2 en only  -> homogeneous
    val docs = Seq(
      (1L, "t", "en", "a", 10L), (2L, "t", "en", "a", 10L),
      (3L, "t", "en", "a", 10L), (4L, "t", "de", "a", 10L),
      (5L, "t", "en", "b", 10L), (6L, "t", "en", "b", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("ldiv") + "/t"
    docs.write.parquet(s"$dir/documents.parquet")
    val got = PrivacyQueries.lDiversity(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("dominant_ppm"), r.getAs[Int]("homogeneous"))))
      .toMap
    assert(got("a") == ((4L, 2L, 750000L, 0)), s"cell a: ${got("a")}")
    assert(got("b") == ((2L, 1L, 1000000L, 1)), s"cell b: ${got("b")}")
  }

  test("q213 dump novelty: dump 0 is all-new and new-hash counts " +
      "partition the distinct corpus") {
    val rows = TextQueries.dumpNovelty(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("dump"))
    assert(rows.length == 4)
    assert(rows(0).getAs[Long]("novelty_ppm") == 1000000L,
      "every hash in the first dump is new by definition")
    val docs = graft.Tables.load(spark, sf0001, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(rows.map(_.getAs[Long]("n_new_hashes")).sum ==
      docs.select(md5(col("text"))).distinct().count(),
      "each distinct hash is new in exactly one dump")
  }

  test("q230 t-closeness: TV bounds, cell conservation, breach gate, " +
      "and exactness on a hand-built skewed table") {
    val rows = PrivacyQueries.tCloseness(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_cell")).sum == corpus,
      "cells must partition the corpus")
    rows.foreach { r =>
      val tv = r.getAs[Long]("tv_x2_ppm")
      // doubled total variation lives in [0, 2e6]
      assert(tv >= 0 && tv <= 2000000, s"TV out of range: $tv")
      assert(r.getAs[Int]("breach") == (if (tv > 400000) 1 else 0),
        "breach gate inconsistent with the reported TV")
    }
    // hand-built check: global = 50/50 over two langs; one cell is pure
    // lang a (TV = 1, doubled ppm = 1e6), the other is exactly global
    // (TV = 0). Uses the same (source, len_bucket, lang) schema via a
    // temp parquet dir shaped like the documents table.
    val dir = tmpDir("graft-tclose")
    Seq(
      (1L, "s1", 10L, "aa"), (2L, "s1", 20L, "aa"),
      (3L, "s2", 10L, "aa"), (4L, "s2", 20L, "bb"),
      (5L, "s2", 30L, "aa"), (6L, "s2", 40L, "bb"))
      .toDF("doc_id", "source", "n_chars", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val got = PrivacyQueries.tCloseness(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("tv_x2_ppm"))).toMap
    // global: aa 4/6 = 666666 ppm, bb 2/6 = 333333 ppm.
    // s1 (all len_bucket 0): pure aa -> |1e6-666666| + |0-333333| = 666667
    // s2: aa 1/2 = 500000 -> |500000-666666| + |500000-333333| = 333333
    assert(got("s1") == 666667L, s"s1 TV: ${got("s1")}")
    assert(got("s2") == 333333L, s"s2 TV: ${got("s2")}")
  }

  test("q240 resume: equals the brute-force seeded order, windows are " +
      "consistent slices, pruned buckets only") {
    // brute-force expected order over the sf0.001 ids, via the same md5
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = ids.map(id => (md5hex(s"$id#shard42"), id))
      .sortBy(identity).map(_._2).toSeq
    val all = TextQueries.resumeAt(spark, sf0001, 0L, 100000L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(all.map(_._1).toSeq == (0L until ids.length).map(identity),
      "full resume must enumerate dense ranks from 0")
    assert(all.map(_._2).toSeq == expected,
      "distributed order != brute-force seeded order")
    // a mid-epoch window is exactly the corresponding slice
    val win = TextQueries.resumeAt(spark, sf0001, 7L, 9L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(win.toSeq == all.slice(7, 16).toSeq)
    // and it reads only the overlapping hash-prefix buckets: the scan
    // joins a bucket-offset table bounded by the window, so the plan's
    // broadcast side holds < 256 rows (here: a handful)
    val plan = TextQueries.resumeAt(spark, sf0001, 7L, 9L)
      .queryExecution.executedPlan.toString.toLowerCase
    // the only range exchange allowed is the presentation sort of the
    // ~n OUTPUT rows on rank; the corpus order key must never be
    // range-partitioned, and the ranking window keys on bucket
    assert(!plan.contains("rangepartitioning(h#"),
      s"resume globally sorted the corpus order key:\n$plan")
    assert(plan.contains("windowspecdefinition(bucket#"),
      s"ranking window must partition by bucket:\n$plan")
  }

  test("q244 global pack: batches fill to the budget in doc order, and " +
      "the plan never range-partitions or single-tasks the corpus") {
    val out = TextQueries.globalPack(spark, sf0001).cache()
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3)))
    // equality with the single-pass sequential fold (the semantics the
    // decomposition must reproduce)
    var cum = 0L
    rows.sortBy(_._1).foreach { case (id, n, batch, offset) =>
      assert(batch == cum / 2048 && offset == cum % 2048,
        s"doc $id: got (batch=$batch, off=$offset), want cum=$cum")
      cum += n
    }
    // batch ids are dense from 0
    val batches = rows.map(_._3).distinct.sorted
    assert(batches.head == 0L && batches.toSeq ==
      (0L to batches.max).toSeq)
    // scale shape: the exclusive-prefix window keys on bucket (the
    // rebased-offset decomposition), never on an empty partition spec,
    // and the corpus is never range-partitioned for a global sort of
    // the packing key (the final presentation orderBy on doc_id is the
    // ~n output rows, allowed)
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("windowspecdefinition(bucket#"),
      s"prefix-sum window must partition by bucket:\n$plan")
    assert(!plan.contains("windowspecdefinition(doc_id#") ||
      plan.contains("windowspecdefinition(bucket#"),
      s"global-window collapse:\n$plan")
    out.unpersist()
  }

  test("q244 equi-depth buckets survive a pathologically clustered id " +
      "space: per-bucket counts stay within a constant factor of " +
      "uniform where the old (max-min)/n split collapses to one bucket") {
    // snowflake-ish: 9,900 ids packed into a 10k-wide band near 10^12,
    // 100 stragglers spread out to 10^15 — a uniform 16-way split puts
    // ~99% of rows into bucket 0
    val clustered = (0L until 9900L).map(i => 1000000000000L + i) ++
      (1L to 100L).map(i => i * 10000000000000L)
    val df = clustered.toDF("doc_id")
    val n = 16
    val splits = TextQueries.equidepthSplits(df, "doc_id", n)
    val counts = df
      .withColumn("bucket", TextQueries.rangeBucket(col("doc_id"), splits))
      .groupBy("bucket").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uniform = clustered.size.toDouble / n
    val maxCount = counts.values.max
    assert(maxCount <= 3 * uniform,
      s"equi-depth bucket skew: max $maxCount vs uniform $uniform " +
        s"($counts)")
    // contrast: the uniform split this replaced really does collapse
    val lo = clustered.min
    val width = math.max(1L, (clustered.max - lo) / n + 1)
    val collapsed = clustered.groupBy(id => (id - lo) / width)
      .values.map(_.size).max
    assert(collapsed >= 9900,
      s"fixture not pathological enough: $collapsed")
  }

  test("q241 MAD gate: planted extreme outlier flagged, uniform " +
      "language clean — and the median stays put under the outlier") {
    import graft.operators.OlapQueries
    val dir = tmpDir("graft-mad")
    // 'aa': tight lengths around 100 with ONE million-char doc — the
    // case a mean/stddev gate mis-centers on; 'bb': perfectly uniform
    val rows = (0L until 21L).map(i => (i, "x", "aa", 95L + (i % 11))) :+
      (21L, "x", "aa", 1000000L)
    val uni = (100L until 120L).map(i => (i, "y", "bb", 500L))
    (rows ++ uni).toDF("doc_id", "text", "lang", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = OlapQueries.madOutliers(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val aa = out("aa")
    assert(aa.getAs[Long]("n") == 22L)
    // robust center: median ~100, untouched by the 1e6 outlier
    assert(aa.getAs[Double]("med") <= 106.0 &&
      aa.getAs[Double]("med") >= 95.0)
    assert(aa.getAs[Long]("n_outliers") == 1L,
      s"exactly the planted outlier flags: $aa")
    val bb = out("bb")
    assert(bb.getAs[Double]("mad") == 0.0 &&
      bb.getAs[Long]("n_outliers") == 0L)
  }
}
