package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming FROM a graft table (`format("graft-table")`): version-log
  * offsets, initial-snapshot batch, append rows, CDC change rows, and
  * checkpointed restart continuity. */
class TableSourceSpec extends SparkSuite {
  import spark.implicits._

  private def freshCat() = {
    val wh = tmpDir("graft-tsrc")
    (new graft.catalog.Catalog(spark, wh), wh)
  }

  /** Drain with AvailableNow into a parquet sink (checkpoint-recoverable
    * — the memory sink is not) and return the sink's CURRENT contents. */
  private def drainOnce(df: org.apache.spark.sql.DataFrame,
      out: String, checkpoint: String): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", checkpoint)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    spark.read.parquet(out)
  }

  test("rows feed: initial snapshot, then appended rows only, exactly once across restarts") {
    val (cat, _) = freshCat()
    cat.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "silver", "s1")
    val dir = cat.path("silver", "s1")
    val ckpt = tmpDir("tsrc-ckpt")
    val out = tmpDir("tsrc-out") + "/sink"
    def stream = spark.readStream.format("graft-table")
      .option("path", dir).load()

    val first = drainOnce(stream, out, ckpt)
    assert(rowsOf(first, "id").map(_.head) == Seq(1L, 2L),
      "initial batch must be the full snapshot")

    // two more commits: an append and another append
    cat.append(Seq((3L, "c")).toDF("id", "v"), "silver", "s1")
    cat.append(Seq((4L, "d")).toDF("id", "v"), "silver", "s1")
    val second = drainOnce(stream, out, ckpt)
    // the checkpointed restart resumes AFTER the snapshot version: the
    // sink accumulates exactly 1..4, no re-delivery of 1/2
    assert(rowsOf(second, "id").map(_.head) == Seq(1L, 2L, 3L, 4L),
      "restart must deliver exactly the new rows")

    // nothing new → empty drain, sink unchanged
    val third = drainOnce(stream, out, ckpt)
    assert(third.count() == 4)
  }

  test("startingVersion: changes-only stream skips the initial snapshot") {
    val (cat, _) = freshCat()
    cat.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "silver", "sv1")
    cat.append(Seq((3L, "c")).toDF("id", "v"), "silver", "sv1") // v2
    val dir = cat.path("silver", "sv1")

    // startingVersion=latest: the existing table never replays — only
    // commits made AFTER the stream starts arrive
    val ckptL = tmpDir("tsrc-svl-ckpt")
    val outL = tmpDir("tsrc-svl-out") + "/sink"
    def latest = spark.readStream.format("graft-table")
      .option("path", dir).option("startingVersion", "latest").load()
    val qe = latest.writeStream.format("parquet")
      .option("path", outL).option("checkpointLocation", ckptL)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    qe.awaitTermination()
    assert(!new java.io.File(outL).exists() ||
      spark.read.parquet(outL).count() == 0,
      "latest must deliver nothing before the next commit")
    cat.append(Seq((4L, "d")).toDF("id", "v"), "silver", "sv1") // v3
    val after = drainOnce(latest, outL, ckptL)
    assert(rowsOf(after, "id").map(_.head) == Seq(4L),
      "only the post-start commit may arrive")

    // startingVersion=1: everything AFTER v1 (the v2 append), no snapshot
    val ckpt1 = tmpDir("tsrc-sv1-ckpt")
    val out1 = tmpDir("tsrc-sv1-out") + "/sink"
    val fromV1 = drainOnce(spark.readStream.format("graft-table")
      .option("path", dir).option("startingVersion", "1").load(),
      out1, ckpt1)
    assert(rowsOf(fromV1, "id").map(_.head) == Seq(3L, 4L),
      "startingVersion=1 must deliver exactly the v2/v3 changes")
  }

  test("cdc feed: updates and deletes arrive as typed change rows") {
    val (cat, _) = freshCat()
    cat.create(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      "silver", "s2")
    cat.register("silver", "s2")
    try {
      val dir = cat.path("silver", "s2")
      val ckpt = tmpDir("tsrc-ckpt2")
      val out = tmpDir("tsrc-out2") + "/sink"
      def stream = spark.readStream.format("graft-table")
        .option("path", dir).option("feed", "cdc").option("keys", "id")
        .load()

      val first = drainOnce(stream, out, ckpt)
      assert(first.count() == 3)
      assert(rowsOf(first).forall(_.last == "insert"))

      // one UPDATE + one deletion-vector DELETE, each a version
      cat.updateWhere("silver", "s2", col("id") === 1L,
        Seq("v" -> lit("A")))
      cat.enableDeletionVectors("silver", "s2")
      cat.deleteWhere("silver", "s2", col("id") === 2L)
      val second = drainOnce(stream, out, ckpt)
      val ch = rowsOf(second.filter(col("_change_type") =!= "insert"),
        "id", "_change_type").map(r => (r.head, r(1), r.last)).toSet
      assert(ch == Set(
        (1L, "a", "update_preimage"), (1L, "A", "update_postimage"),
        (2L, "b", "delete")),
        s"typed change rows diverged: $ch")
    } finally cat.dropRegistration("silver", "s2")
  }

  test("table-to-table: stream a silver table into a gold SCD2 dim (the medallion loop)") {
    val (cat, _) = freshCat()
    cat.create(Seq((1L, "v1", 1L), (2L, "w1", 1L)).toDF("id", "attr", "seq"),
      "silver", "src")
    val dir = cat.path("silver", "src")
    val ckpt = tmpDir("tsrc-ckpt4")
    def pump(): Unit = {
      val changes = spark.readStream.format("graft-table")
        .option("path", dir).load()
      graft.streaming.Streams.applyChangesScd2(changes, cat, "dim",
        keys = Seq("id"), tracked = Seq("attr"), skeyCol = "dim_key",
        checkpoint = ckpt, now = lit(Timestamp.valueOf("2026-01-01 00:00:00")),
        sequenceBy = Seq("seq"))
    }
    pump() // initial snapshot → both keys current
    val d1 = cat.read("gold", "dim")
    assert(d1.filter(col("is_current")).count() == 2)

    // a new version of key 1 + a fresh key appended upstream
    cat.append(Seq((1L, "v2", 2L), (3L, "x1", 1L)).toDF("id", "attr", "seq"),
      "silver", "src")
    pump() // only the appended rows flow; SCD2 expires v1
    val d2 = cat.read("gold", "dim")
    assert(d2.filter(col("is_current")).count() == 3)
    assert(rowsOf(d2.filter(col("id") === 1L).select("attr", "is_current"),
      "attr") == Seq(Seq("v1", false), Seq("v2", true)),
      "SCD2 must expire the old attribute version")
    // replaying with nothing new is a no-op
    pump()
    assert(cat.read("gold", "dim").count() ==
      d2.count(), "empty drain must not change the dim")
  }

  test("end-to-end exactly-once: graft source -> transform -> graft append sink") {
    // the full table-to-table streaming pipeline on graft's OWN source
    // AND sink: every micro-batch leaves the downstream table as a
    // committed version, and replays (same checkpoint, no new upstream
    // data) are no-ops on both sides
    val (cat, _) = freshCat()
    cat.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "x"), "silver", "s4")
    val src = cat.path("silver", "s4")
    val dstDir = cat.path("gold", "s4_out")
    val ckpt = tmpDir("tsrc-ckpt5")
    def pump(): Unit =
      graft.streaming.Streams.appendStream(
        spark.readStream.format("graft-table").option("path", src).load()
          .withColumn("x2", col("x") * 2),
        dstDir, ckpt)
    pump()
    assert(rowsOf(cat.read("gold", "s4_out"), "id").map(_.last) ==
      Seq(20L, 40L))
    cat.append(Seq((3L, 30L)).toDF("id", "x"), "silver", "s4")
    pump()
    assert(rowsOf(cat.read("gold", "s4_out"), "id").map(_.last) ==
      Seq(20L, 40L, 60L))
    // no new upstream data: replay adds nothing, commits nothing
    val v = graft.catalog.Catalog.readPointer(
      new org.apache.hadoop.fs.Path(dstDir).getFileSystem(
        spark.sparkContext.hadoopConfiguration), dstDir)
    pump()
    assert(cat.read("gold", "s4_out").count() == 3)
    assert(graft.catalog.Catalog.readPointer(
      new org.apache.hadoop.fs.Path(dstDir).getFileSystem(
        spark.sparkContext.hadoopConfiguration), dstDir) == v,
      "empty replay must not mint a version")
  }

  test("maxVersionsPerTrigger: a backlog drains over bounded batches, exactly once") {
    val (cat, _) = freshCat()
    cat.create(Seq((1L, "a")).toDF("id", "v"), "silver", "s5")
    val dir = cat.path("silver", "s5")
    val ckpt = tmpDir("tsrc-ckpt6")
    val out = tmpDir("tsrc-out6") + "/sink"
    def stream = spark.readStream.format("graft-table")
      .option("path", dir).option("maxVersionsPerTrigger", "2").load()

    // initial snapshot (one batch by design), then stop
    drainOnce(stream, out, ckpt)
    // build a 6-version backlog while the stream is down
    (2L to 7L).foreach { i =>
      cat.append(Seq((i, s"r$i")).toDF("id", "v"), "silver", "s5")
    }
    val offsetsBefore = new java.io.File(s"$ckpt/offsets").list().length
    // continuous micro-batch run (AvailableNow collapses v1 sources to a
    // single batch): processAllAvailable triggers until the capped
    // offsets catch up with the table pointer
    val q = stream.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val drained = spark.read.parquet(out)
    // all rows arrive exactly once...
    assert(rowsOf(drained, "id").map(_.head) == (1L to 7L),
      "rate-limited drain must still deliver everything exactly once")
    // ...but over >= 3 bounded batches (6 versions / cap 2), not one: the
    // admission cursor persisted in the source metadata caps the first
    // restart batch too
    val offsetsAfter = new java.io.File(s"$ckpt/offsets").list().length
    assert(offsetsAfter - offsetsBefore >= 3,
      s"backlog drained in ${offsetsAfter - offsetsBefore} batch(es); " +
        "expected >= 3 bounded batches")
    // every logged offset advance respects the cap after the snapshot
    val versions = new java.io.File(s"$ckpt/offsets").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      .map(f => scala.io.Source.fromFile(f).getLines().toSeq.last.trim.toLong)
      .toSeq
    versions.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b - a <= 2, s"offset jump $a -> $b exceeds the version cap")
      case _ => ()
    }
    // the cdc fold equals the live table after the drain (rows feed here:
    // sink contents already checked above); nothing left to deliver
    assert(drainOnce(stream, out, ckpt).count() == 7)
  }

  test("maxBytesPerTrigger: soft byte bound, one version per batch at minimum") {
    val (cat, _) = freshCat()
    cat.create(Seq((1L, "a")).toDF("id", "v"), "silver", "s7")
    val dir = cat.path("silver", "s7")
    val ckpt = tmpDir("tsrc-ckpt7")
    val out = tmpDir("tsrc-out7") + "/sink"
    // a 1-byte budget is always exceeded by the NEXT version — the soft
    // bound must still admit exactly one version per trigger (progress),
    // never zero and never two
    def stream = spark.readStream.format("graft-table")
      .option("path", dir).option("maxBytesPerTrigger", "1").load()
    drainOnce(stream, out, ckpt)
    (2L to 5L).foreach { i =>
      cat.append(Seq((i, s"r$i")).toDF("id", "v"), "silver", "s7")
    }
    val before = new java.io.File(s"$ckpt/offsets").list().length
    val q = stream.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val drained = spark.read.parquet(out)
    assert(rowsOf(drained, "id").map(_.head) == (1L to 5L),
      "byte-limited drain must still deliver everything exactly once")
    assert(new java.io.File(s"$ckpt/offsets").list().length - before >= 4,
      "a 1-byte budget must drain one version per batch")
    val versions = new java.io.File(s"$ckpt/offsets").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      .map(f => scala.io.Source.fromFile(f).getLines().toSeq.last.trim.toLong)
      .toSeq
    versions.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b - a <= 1, s"offset jump $a -> $b exceeds the byte budget")
      case _ => ()
    }
    // a generous budget with no version cap drains the rest in one batch
    val (cat2, _) = freshCat()
    cat2.create(Seq((1L, "a")).toDF("id", "v"), "silver", "s8")
    val dir2 = cat2.path("silver", "s8")
    val ckpt2 = tmpDir("tsrc-ckpt8")
    val out2 = tmpDir("tsrc-out8") + "/sink"
    def wide = spark.readStream.format("graft-table")
      .option("path", dir2).option("maxBytesPerTrigger", "104857600").load()
    drainOnce(wide, out2, ckpt2)
    (2L to 4L).foreach { i =>
      cat2.append(Seq((i, s"r$i")).toDF("id", "v"), "silver", "s8")
    }
    val b2 = new java.io.File(s"$ckpt2/offsets").list().length
    val q2 = wide.writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", ckpt2)
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(rowsOf(spark.read.parquet(out2), "id").map(_.head) == (1L to 4L))
    // one data batch (the engine may log one extra empty catch-up
    // entry): the whole backlog is admitted together, NOT one version
    // per trigger like the tight-budget run above
    assert(new java.io.File(s"$ckpt2/offsets").list().length - b2 <= 2,
      "a 100 MiB budget must admit the whole 3-version backlog at once")
  }

  test("fully-qualified provider name also resolves; missing path raises") {
    val (cat, _) = freshCat()
    cat.create(Seq((7L, "x")).toDF("id", "v"), "silver", "s3")
    val dir = cat.path("silver", "s3")
    val df = spark.readStream
      .format(classOf[graft.streaming.GraftTableSourceProvider].getName)
      .option("path", dir).load()
    val got = drainOnce(df, tmpDir("tsrc-out3") + "/sink",
      tmpDir("tsrc-ckpt3"))
    assert(got.count() == 1)
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-table").load().schema
    }
    assert(e.getMessage.contains("path"))
  }
}
