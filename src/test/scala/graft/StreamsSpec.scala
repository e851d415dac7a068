package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams
import graft.streaming.Streams.{Threshold, UserEvent}

/** Custom keyed state across micro-batches: mapGroupsWithState keeps one
  * running value per key; flatMapGroupsWithState emits 0..n alert rows per
  * batch. Two `addData` rounds prove the state store carries between
  * micro-batches (the property a 100 TB/day stream depends on). */
class StreamsSpec extends SparkSuite {

  private def ev(u: Long, s: String) =
    UserEvent(u, Timestamp.valueOf(s"2026-01-01 00:00:0$s"), "click")

  test("mapGroupsWithState: running counts persist across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = Streams.runningUserCounts(in.toDS())
      .writeStream.format("memory").queryName("running_counts")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(ev(1, "1"), ev(1, "2"), ev(2, "1"))
      q.processAllAvailable()
      val batch1 = spark.table("running_counts").as[(Long, Long)].collect().toMap
      assert(batch1 == Map(1L -> 2L, 2L -> 1L))
      in.addData(ev(1, "3"), ev(2, "2"), ev(3, "1"))
      q.processAllAvailable()
      val all = spark.table("running_counts").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(all == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    } finally q.stop()
  }

  test("streaming CDC apply: SCD2 merges per micro-batch via foreachBatch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = tmpDir("graft-cdc")
    val cat = new graft.catalog.Catalog(spark, s"$root/wh")
    val land = new java.io.File(s"$root/landing"); land.mkdirs()
    val fixedNow = to_timestamp(lit("2026-02-01 00:00:00"))
    def drain(): Unit = Streams.applyChangesScd2(
      spark.readStream
        .schema("product_id BIGINT, brand STRING, price DOUBLE")
        .parquet(land.toString),
      cat, "product_dim_stream", Seq("product_id"), Seq("brand", "price"),
      "product_skey", s"$root/_cp", fixedNow)

    // batch 1: initial load
    Seq((1L, "acme", 10.0), (2L, "bolt", 20.0)).toDF("product_id", "brand", "price")
      .write.mode("append").parquet(land.toString)
    drain()
    val v1 = cat.read("gold", "product_dim_stream")
    assert(v1.count() == 2 && v1.filter(col("is_current")).count() == 2)

    // batch 2: one change + one new key → expire + two new current versions
    Seq((1L, "acme", 12.5), (3L, "core", 30.0)).toDF("product_id", "brand", "price")
      .write.mode("append").parquet(land.toString)
    drain()
    val v2 = cat.read("gold", "product_dim_stream")
    assert(v2.count() == 4) // 2 current originals -> 1 kept + 1 expired + 2 new
    assert(v2.filter(col("is_current")).count() == 3)
    val p1 = v2.filter(col("product_id") === 1L)
    assert(p1.count() == 2)
    assert(p1.filter(!col("is_current") && col("price") === 10.0).count() == 1)
    assert(p1.filter(col("is_current") && col("price") === 12.5).count() == 1)

    // drain with nothing new: checkpoint makes it a no-op
    drain()
    assert(cat.read("gold", "product_dim_stream").count() == 4)
  }

  test("streaming CDC apply: sequenceBy keeps only the latest change per key in a batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = tmpDir("graft-cdc-seq")
    val cat = new graft.catalog.Catalog(spark, s"$root/wh")
    val land = new java.io.File(s"$root/landing"); land.mkdirs()
    val fixedNow = to_timestamp(lit("2026-02-01 00:00:00"))
    def drain(): Unit = Streams.applyChangesScd2(
      spark.readStream
        .schema("product_id BIGINT, brand STRING, price DOUBLE, change_seq BIGINT")
        .parquet(land.toString),
      cat, "product_dim_seq", Seq("product_id"), Seq("brand", "price"),
      "product_skey", s"$root/_cp", fixedNow, sequenceBy = Seq("change_seq"))

    // batch 1: key 1 appears THREE times (raw CDC) — only seq=3 may land
    Seq((1L, "acme", 10.0, 1L), (1L, "acme", 11.0, 2L), (1L, "acme", 12.0, 3L),
        (2L, "bolt", 20.0, 1L))
      .toDF("product_id", "brand", "price", "change_seq")
      .write.mode("append").parquet(land.toString)
    drain()
    val v1 = cat.read("gold", "product_dim_seq")
    assert(v1.count() == 2)
    assert(v1.filter(col("product_id") === 1L).collect()(0)
      .getAs[Double]("price") == 12.0)

    // batch 2: two more changes for key 1 → one expire + one new current at seq=5
    Seq((1L, "acme", 13.0, 4L), (1L, "acme", 14.0, 5L))
      .toDF("product_id", "brand", "price", "change_seq")
      .write.mode("append").parquet(land.toString)
    drain()
    val v2 = cat.read("gold", "product_dim_seq")
    assert(v2.count() == 3) // bolt current + acme expired + acme current
    val cur1 = v2.filter(col("product_id") === 1L && col("is_current"))
    assert(cur1.count() == 1 && cur1.collect()(0).getAs[Double]("price") == 14.0)

    // batch 3: a LATE-ARRIVING older change (seq=2 < applied seq=5) — the
    // cross-batch guard must drop it before the merge; without it the stale
    // row would expire the newer current version
    Seq((1L, "acme", 99.0, 2L))
      .toDF("product_id", "brand", "price", "change_seq")
      .write.mode("append").parquet(land.toString)
    drain()
    val v3 = cat.read("gold", "product_dim_seq")
    assert(v3.count() == 3, "late change must not add a version")
    val cur3 = v3.filter(col("product_id") === 1L && col("is_current"))
    assert(cur3.count() == 1 && cur3.collect()(0).getAs[Double]("price") == 14.0,
      "late change must not displace the newer current row")

    // batch 4: an exact REPLAY of the applied change (seq=5) — equal
    // sequence is not newer; dropped, state unchanged
    Seq((1L, "acme", 14.0, 5L))
      .toDF("product_id", "brand", "price", "change_seq")
      .write.mode("append").parquet(land.toString)
    drain()
    assert(cat.read("gold", "product_dim_seq").count() == 3)
  }

  test("streaming CDC apply with nBuckets: only buckets holding changed keys rewrite") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.merge.PartitionedMerge
    val root = tmpDir("graft-cdc-buck")
    val cat = new graft.catalog.Catalog(spark, s"$root/wh")
    val land = new java.io.File(s"$root/landing"); land.mkdirs()
    val fixedNow = to_timestamp(lit("2026-02-01 00:00:00"))
    val nB = 8
    def drain(): Unit = Streams.applyChangesScd2(
      spark.readStream
        .schema("product_id BIGINT, brand STRING, price DOUBLE")
        .parquet(land.toString),
      cat, "product_dim_buck", Seq("product_id"), Seq("brand", "price"),
      "product_skey", s"$root/_cp", fixedNow, nBuckets = Some(nB))

    // batch 1: 20 keys spread over the buckets
    (1L to 20L).map(i => (i, s"brand$i", i * 1.0))
      .toDF("product_id", "brand", "price")
      .write.mode("append").parquet(land.toString)
    drain()
    val path = cat.path("gold", "product_dim_buck")
    def bucketState(): Map[String, Seq[(String, Long, Long)]] = {
      val dir = new java.io.File(path)
      dir.listFiles().filter(f => f.isDirectory &&
        f.getName.startsWith(s"${PartitionedMerge.BucketCol}="))
        .map { d =>
          d.getName -> d.listFiles().filterNot(_.getName.startsWith("."))
            .map(f => (f.getName, f.lastModified(), f.length()))
            .sortBy(_._1).toSeq
        }.toMap
    }
    val before = bucketState()
    assert(before.nonEmpty)

    // batch 2: change key 3, add key 33 — only their buckets may rewrite
    Seq((3L, "brand3x", 3.5), (33L, "brand33", 33.0))
      .toDF("product_id", "brand", "price")
      .write.mode("append").parquet(land.toString)
    drain()
    val after = bucketState()
    val touched = Seq(3L, 33L).toDF("product_id")
      .select(PartitionedMerge.bucketExpr(Seq("product_id"), nB).as("b"))
      .distinct().collect().map(r => s"${PartitionedMerge.BucketCol}=${r.getInt(0)}").toSet

    before.keys.filterNot(touched).foreach { b =>
      assert(after(b) == before(b),
        s"untouched bucket $b was rewritten by the CDC merge")
    }
    touched.foreach(b => assert(after.get(b) != before.get(b),
      s"touched bucket $b was not rewritten"))

    // and the merge semantics held: key 3 has two versions, one current
    val dim = PartitionedMerge.read(spark, path)
    assert(dim.count() == 22) // 20 + expired v of key 3 + ...
    assert(dim.filter(col("product_id") === 3L).count() == 2)
    assert(dim.filter(col("product_id") === 3L && col("is_current"))
      .collect()(0).getAs[String]("brand") == "brand3x")
    assert(dim.filter(col("product_id") === 33L && col("is_current")).count() == 1)
    assert(dim.filter(col("is_current")).count() == 21)
  }

  test("CDC replay guard: batches at or below the applied marker are no-ops") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = tmpDir("graft-cdc-guard")
    val cat = new graft.catalog.Catalog(spark, s"$root/wh")
    val land = new java.io.File(s"$root/landing"); land.mkdirs()
    val fixedNow = to_timestamp(lit("2026-02-01 00:00:00"))
    def drain(): Unit = Streams.applyChangesScd2(
      spark.readStream
        .schema("product_id BIGINT, brand STRING, price DOUBLE")
        .parquet(land.toString),
      cat, "product_dim_guard", Seq("product_id"), Seq("brand", "price"),
      "product_skey", s"$root/_cp", fixedNow)

    Seq((1L, "acme", 10.0)).toDF("product_id", "brand", "price")
      .write.mode("append").parquet(land.toString)
    drain()
    assert(cat.read("gold", "product_dim_guard").count() == 1)
    assert(Streams.lastAppliedBatch(spark, s"$root/_cp") == 0L)

    // simulate an already-applied marker from a crashed future attempt:
    // the next delivered batch id (1) is <= marker → the merge must skip
    Streams.recordAppliedBatch(spark, s"$root/_cp", 999L)
    Seq((1L, "acme", 99.0)).toDF("product_id", "brand", "price")
      .write.mode("append").parquet(land.toString)
    drain()
    val dim = cat.read("gold", "product_dim_guard")
    assert(dim.count() == 1, "guarded batch still merged")
    assert(dim.collect()(0).getAs[Double]("price") == 10.0)
  }

  test("appendNewDocs: duplicate content never re-appends, in-batch or cross-batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = tmpDir("graft-ingest-dedup")
    val cat = new graft.catalog.Catalog(spark, s"$root/wh")
    val land = new java.io.File(s"$root/landing"); land.mkdirs()
    def drain(): Unit = Streams.appendNewDocs(
      spark.readStream.schema("doc_id BIGINT, text STRING")
        .parquet(land.toString),
      cat, "bronze", "corpus", Seq("text"), "doc_id", s"$root/_cp")

    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("append").parquet(land.toString)
    drain()
    assert(cat.read("bronze", "corpus").count() == 2)

    // batch 2: doc 3 duplicates doc 1's content (cross-batch), doc 4 is
    // new, doc 5 duplicates doc 4 IN the same batch
    Seq((3L, "alpha"), (4L, "gamma"), (5L, "gamma")).toDF("doc_id", "text")
      .write.mode("append").parquet(land.toString)
    drain()
    val corpus = cat.read("bronze", "corpus")
    assert(corpus.count() == 3, "duplicate content re-appended")
    assert(corpus.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L))
    // replay with nothing new: checkpoint makes it a no-op
    drain()
    assert(cat.read("bronze", "corpus").count() == 3)
  }

  test("appendNearDedup: near-dups drop against the maintained band index") {
    import spark.implicits._
    val root = tmpDir("graft-neardedup")
    val cat = new graft.catalog.Catalog(spark, s"$root/wh")
    val land = new java.io.File(s"$root/landing"); land.mkdirs()
    def drain(): Unit = Streams.appendNearDedup(
      spark.readStream.schema("doc_id BIGINT, text STRING")
        .parquet(land.toString),
      cat, "bronze", "docs", "text", "doc_id", s"$root/_cp")

    // a long doc: one edited word keeps Jaccard ≈ 0.98, so at least one
    // of the 4 bands collides (deterministic given the fixed md5 hashes —
    // this test pins that it DOES for this fixture)
    val a = (1 to 100).map(i => s"alpha$i").mkString(" ")
    val b = "completely different content about spark streaming state stores"
    Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      .write.mode("append").parquet(land.toString)
    drain()
    assert(cat.read("bronze", "docs").count() == 2)
    assert(cat.exists("bronze", "docs_bands"))
    assert(cat.read("bronze", "docs_bands").count() == 8) // 2 docs x 4 bands

    // batch 2: doc 3 edits ONE word of doc 1 (cross-batch near-dup),
    // doc 4 is novel, doc 5 is an exact copy of doc 4 (in-batch dup)
    val a2 = a.replace("alpha50", "beta50")
    val c = "unrelated third topic entirely about medallion lakehouse tables"
    Seq((3L, a2), (4L, c), (5L, c)).toDF("doc_id", "text")
      .write.mode("append").parquet(land.toString)
    drain()
    val ids = cat.read("bronze", "docs")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L), s"wrong survivors: $ids")
    // the index only carries survivors' bands
    assert(cat.read("bronze", "docs_bands").count() == 12)

    // replay with nothing new: checkpoint makes it a no-op
    drain()
    assert(cat.read("bronze", "docs").count() == 3)
  }

  test("appendDecontamGuard: bench clones quarantine with their match, " +
      "clean docs land, replay is a no-op") {
    import spark.implicits._
    val root = tmpDir("graft-decontamguard")
    val cat = new graft.catalog.Catalog(spark, s"$root/wh")
    val land = new java.io.File(s"$root/landing"); land.mkdirs()
    // bench vectors live in dims [0,32); clean docs in dims [32,64) —
    // exactly orthogonal, so a clean doc can NEVER clear the cosine bar
    // and a planted clone always scores 1.0
    def benchVec(seed: Int): Array[Float] =
      Array.tabulate(64)(i =>
        if (i < 32) (((seed * 31 + i * 7) % 19) - 9) / 9.0f else 0.0f)
    def cleanVec(seed: Int): Array[Float] =
      Array.tabulate(64)(i =>
        if (i >= 32) (((seed * 31 + i * 7) % 19) - 9) / 9.0f else 0.0f)
    cat.create(Seq((100L, benchVec(1)), (101L, benchVec(2)),
      (102L, benchVec(3))).toDF("doc_id", "embedding"), "bronze", "bench")
    def drain(): Unit = Streams.appendDecontamGuard(
      spark.readStream.schema("doc_id BIGINT, embedding ARRAY<FLOAT>")
        .parquet(land.toString),
      cat, "bronze", "docs", "bench", "embedding", "doc_id", s"$root/_cp")

    // batch 1: doc 1 is an exact clone of bench 101; docs 2/3 are clean
    Seq((1L, benchVec(2)), (2L, cleanVec(7)), (3L, cleanVec(8)))
      .toDF("doc_id", "embedding")
      .write.mode("append").parquet(land.toString)
    drain()
    assert(cat.read("bronze", "docs").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(2L, 3L))
    val quar = cat.read("bronze", "docs_quarantine").collect()
    assert(quar.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    assert(quar(0).getAs[Long]("matched_bench_id") == 101L)
    assert(quar(0).getAs[Double]("bench_cos") == 1.0)

    // batch 2: another clone + another clean doc
    Seq((4L, benchVec(3)), (5L, cleanVec(9)))
      .toDF("doc_id", "embedding")
      .write.mode("append").parquet(land.toString)
    drain()
    assert(cat.read("bronze", "docs").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(2L, 3L, 5L))
    assert(cat.read("bronze", "docs_quarantine").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 4L))

    // checkpointed replay with nothing new: both tables unchanged
    drain()
    assert(cat.read("bronze", "docs").count() == 3)
    assert(cat.read("bronze", "docs_quarantine").count() == 2)

    // each drained batch published a cross-table epoch: auditors joining
    // corpus + quarantine through it see ONE batch generation
    import graft.pipeline.PipelineEpoch
    val e = PipelineEpoch.currentEpoch(spark, cat, "decontam_docs")
    assert(e >= 2, s"expected an epoch per drained batch, got $e")
    assert(PipelineEpoch.read(spark, cat, "decontam_docs", "bronze.docs")
      .count() == 3)
    assert(PipelineEpoch
      .read(spark, cat, "decontam_docs", "bronze.docs_quarantine")
      .count() == 2)
    // an epoch BEFORE batch 2 serves batch-1 state for BOTH tables
    val v1 = PipelineEpoch.tableVersions(spark, cat, "decontam_docs", 1)
    assert(PipelineEpoch
      .readAt(spark, cat, "decontam_docs", "bronze.docs", 1).count() == 2,
      s"epoch 1 recorded $v1")
    assert(PipelineEpoch.readAt(spark, cat, "decontam_docs",
      "bronze.docs_quarantine", 1).count() == 1)
  }

  test("appendStream: each drained batch is a version; replays drop whole") {
    import spark.implicits._
    val root = tmpDir("graft-appendstream")
    val cat = new graft.catalog.Catalog(spark, s"$root/wh")
    val land = new java.io.File(s"$root/landing"); land.mkdirs()
    val dir = cat.path("bronze", "ev")
    def drain(): Unit = Streams.appendStream(
      spark.readStream.schema("id BIGINT, v STRING")
        .parquet(land.toString), dir, s"$root/_cp")

    Seq((1L, "a")).toDF("id", "v")
      .write.mode("append").parquet(land.toString)
    drain()
    assert(spark.read.parquet(dir).count() == 1)
    assert(cat.currentVersion("bronze", "ev") == 1)

    Seq((2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("append").parquet(land.toString)
    drain()
    assert(rowsOf(spark.read.parquet(dir), "id") ==
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    // the second drain committed a REAL version: v1 still shows batch 1
    assert(cat.currentVersion("bronze", "ev") == 2)
    assert(cat.readVersion("bronze", "ev", 1).count() == 1)

    // no new files → AvailableNow drains nothing, no empty version
    drain()
    assert(cat.currentVersion("bronze", "ev") == 2)

    // crash replay: marker says batch 1 applied; a re-delivery of batch 1
    // (simulated by rolling the marker back after the drain) is the only
    // path to a duplicate — with the marker intact, re-running with the
    // same checkpoint appends nothing
    Seq((4L, "d")).toDF("id", "v")
      .write.mode("append").parquet(land.toString)
    drain()
    assert(spark.read.parquet(dir).count() == 4)
    assert(cat.currentVersion("bronze", "ev") == 3)

    // crash BETWEEN the version swap and ALL post-commit markers: erase
    // both Spark's commit-log entry for the last batch and the graft
    // checkpoint marker — on restart Spark re-delivers batch 2 (same
    // offsets) and the checkpoint side claims it was never applied. The
    // commit tag stamped INTO version 3 itself is the only remaining
    // defense, and it must drop the replay whole.
    val fs = new java.io.File(s"$root/_cp")
    new java.io.File(fs, "commits/2").delete()
    new java.io.File(fs, "commits/.2.crc").delete() // local-FS checksum sidecar
    new java.io.File(fs, "__graft_last_applied").delete()
    new java.io.File(fs, ".__graft_last_applied.crc").delete()
    drain()
    assert(spark.read.parquet(dir).count() == 4,
      "replayed batch was appended twice (swap-to-marker window open)")
    assert(cat.currentVersion("bronze", "ev") == 3,
      "replay must not commit a new version")
    // and the replay re-armed the checkpoint marker for future drains
    Seq((5L, "e")).toDF("id", "v")
      .write.mode("append").parquet(land.toString)
    drain()
    assert(spark.read.parquet(dir).count() == 5)
  }

  test("streaming dedup: re-delivered events within the watermark are dropped across runs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = tmpDir("graft-stream-dedup")
    val land = new java.io.File(s"$root/landing"); land.mkdirs()
    val out = s"$root/out"
    def drain(): Unit = {
      val q = Streams.dedupStream(
        spark.readStream
          .schema("event_id BIGINT, ts TIMESTAMP, v STRING")
          .parquet(land.toString),
        Seq("event_id"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", s"$root/_cp")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def ev(rows: Seq[(Long, String, String)]) =
      rows.toDF("event_id", "ts_s", "v")
        .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"), col("v"))
    ev(Seq((1L, "2026-01-01 10:00:00", "a"), (2L, "2026-01-01 10:00:10", "b")))
      .write.mode("append").parquet(land.toString)
    drain()
    assert(spark.read.parquet(out).count() == 2)
    // event 1 re-delivered (same id, within the watermark) + a new event 3
    ev(Seq((1L, "2026-01-01 10:00:00", "a"), (3L, "2026-01-01 10:00:20", "c")))
      .write.mode("append").parquet(land.toString)
    drain()
    val got = spark.read.parquet(out)
    assert(got.count() == 3, "re-delivered event was not deduped")
    assert(got.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("stream-stream interval join matches within the time bound only") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[UserEvent]
    val views = MemoryStream[UserEvent]
    val joined = Streams.clickViewStreamJoin(
      clicks.toDS().toDF(), views.toDS().toDF())
    val q = joined.writeStream.format("memory").queryName("cv_join")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s"2026-01-01 $s")
      views.addData(UserEvent(1, t("10:00:00"), "view"),
        UserEvent(2, t("10:00:00"), "view"))
      clicks.addData(
        UserEvent(1, t("10:05:00"), "click"),  // in window → match
        UserEvent(1, t("10:20:00"), "click"),  // past 10 min → no match
        UserEvent(2, t("09:55:00"), "click"),  // before the view → no match
        UserEvent(3, t("10:05:00"), "click"))  // no view at all → no match
      q.processAllAvailable()
      val got = spark.table("cv_join")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(got == Set((1L, t("10:05:00"), t("10:00:00"))))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: unmatched views emit null-padded after the watermark closes their window") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[UserEvent]
    val views = MemoryStream[UserEvent]
    val joined = Streams.viewClickOuterJoin(
      views.toDS().toDF(), clicks.toDS().toDF())
    val q = joined.writeStream.format("memory").queryName("vc_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = Timestamp.valueOf(s"2026-01-01 $s")
      views.addData(UserEvent(1, t("10:00:00"), "view"),   // will match
        UserEvent(2, t("10:00:00"), "view"))               // never matches
      clicks.addData(UserEvent(1, t("10:05:00"), "click"))
      q.processAllAvailable()
      // the match emits promptly; user 2's "no match" is NOT final yet —
      // a qualifying click could still arrive
      val early = spark.table("vc_outer")
        .as[(Long, Timestamp, Option[Timestamp])].collect().toSet
      assert(early == Set((1L, t("10:00:00"), Some(t("10:05:00")))),
        s"premature or missing rows: $early")
      // advance BOTH watermarks far past view+10min+30min lateness: the
      // unmatched view's window is now closed → null-padded row emits
      clicks.addData(UserEvent(9, t("12:00:00"), "click"))
      views.addData(UserEvent(9, t("12:00:00"), "view"))
      q.processAllAvailable()
      // one more batch so the state-eviction pass runs after the
      // watermark advance
      clicks.addData(UserEvent(9, t("12:30:00"), "click"))
      q.processAllAvailable()
      val late = spark.table("vc_outer")
        .as[(Long, Timestamp, Option[Timestamp])].collect().toSet
      assert(late.contains((2L, t("10:00:00"), None)),
        s"unmatched view never emitted null-padded: $late")
      // and the matched row did not duplicate
      assert(late.count(_._1 == 1L) == 1)
    } finally q.stop()
  }

  test("flatMapGroupsWithState: threshold alerts fire once per crossing") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = Streams.thresholdAlerts(in.toDS(), every = 3)
      .writeStream.format("memory").queryName("alerts")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1 to 4).map(i => ev(7, i.toString)): _*) // count 4 → alert at 3
      q.processAllAvailable()
      assert(spark.table("alerts").as[Threshold].collect().toSeq ==
        Seq(Threshold(7, 3, 4)))
      in.addData((5 to 10).map(i => ev(7, i.toString)): _*) // 10 → alerts 6, 9
      q.processAllAvailable()
      assert(spark.table("alerts").as[Threshold].collect().toSet ==
        Set(Threshold(7, 3, 4), Threshold(7, 6, 10), Threshold(7, 9, 10)))
    } finally q.stop()
  }
}
