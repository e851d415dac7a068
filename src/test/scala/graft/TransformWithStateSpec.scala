package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streams
import graft.streaming.Streams.{DedupAudit, HashedDoc}

/** The Spark 4 transformWithState surface (Streams.dedupAuditTws):
  * named typed state variables with independent TTLs on the RocksDB
  * state store. Covers first/dup classification within and across
  * micro-batches, the TTL-expiry re-admission trade, and the TTL-free
  * audit counter surviving the seen-marker's expiry.
  *
  * A ProcessingTime-mode transformWithState query schedules micro-batches
  * continuously (the clock must advance for TTL/timers), so neither
  * AvailableNow nor processAllAvailable terminates it — the tests poll
  * the sink for the expected row count and stop the query explicitly. */
class TransformWithStateSpec extends SparkSuite {
  import spark.implicits._

  private def withRocksDb[A](body: => A): A = {
    // changelog checkpointing matters even at test scale: the default
    // full-snapshot upload renames hundreds of sst files per micro-batch
    // through RawLocalFileSystem (a fork/exec per rename)
    val confs = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def awaitRows(name: String, n: Long,
      timeoutMs: Long = 120000): Seq[DedupAudit] = {
    val t0 = System.currentTimeMillis()
    while (spark.table(name).count() < n) {
      assert(System.currentTimeMillis() - t0 < timeoutMs,
        s"timed out waiting for $n rows in $name " +
          s"(have ${spark.table(name).count()})")
      Thread.sleep(100)
    }
    spark.table(name).as[DedupAudit].collect().toSeq
  }

  test("dedup audit: first/dup flags within and across batches") {
    withRocksDb {
      implicit val sql = spark.sqlContext
      val in = MemoryStream[HashedDoc]
      val q = Streams.dedupAuditTws(in.toDS(),
          java.time.Duration.ofHours(1))
        .writeStream.format("memory").queryName("tws1")
        .outputMode("append").start()
      try {
        in.addData(HashedDoc(1L, "A"), HashedDoc(2L, "A"), HashedDoc(3L, "B"))
        awaitRows("tws1", 3)
        in.addData(HashedDoc(4L, "A"), HashedDoc(5L, "C"))
        val rows = awaitRows("tws1", 5).sortBy(_.doc_id)
        assert(rows.map(r => (r.doc_id, r.content_hash, r.is_first,
          r.n_dups)) == Seq(
          (1L, "A", true, 0L),   // first A
          (2L, "A", false, 1L),  // in-batch dup
          (3L, "B", true, 0L),
          (4L, "A", false, 2L),  // cross-batch dup: counter continued
          (5L, "C", true, 0L)),
          s"got $rows")
      } finally q.stop()
    }
  }

  test("dedup audit: seen marker expires by TTL, audit counter does not") {
    withRocksDb {
      implicit val sql = spark.sqlContext
      val in = MemoryStream[HashedDoc]
      val q = Streams.dedupAuditTws(in.toDS(),
          java.time.Duration.ofMillis(800))
        .writeStream.format("memory").queryName("tws2")
        .outputMode("append").start()
      try {
        in.addData(HashedDoc(1L, "X"), HashedDoc(2L, "X"))
        awaitRows("tws2", 2)
        Thread.sleep(2000) // let the seen marker's TTL lapse
        in.addData(HashedDoc(3L, "X"))
        val rows = awaitRows("tws2", 3).sortBy(_.doc_id)
        assert(rows.map(r => (r.doc_id, r.is_first, r.n_dups)) ==
          Seq((1L, true, 0L), (2L, false, 1L),
            // re-admitted as first after expiry — but the TTL-free dup
            // counter still remembers the key's history
            (3L, true, 1L)),
          s"got $rows")
      } finally q.stop()
    }
  }
}
