package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streams
import graft.streaming.Streams.UserEvent

/** Event-time sessionization via flatMapGroupsWithState + EventTimeTimeout
  * ([[Streams.sessionizeStream]]): sessions must emit exactly once, only
  * after the watermark passes their close (start-gap finality), idle keys
  * must flush through the timeout path (no further data for the key), and
  * an out-of-order event inside the allowed lateness must BRIDGE two
  * previously separate pending sessions into one.
  *
  * Emission schedule assumes `spark.sql.streaming.noDataMicroBatches
  * .enabled` (the default): after `processAllAvailable`, every session
  * whose close is behind `maxEventTime - delay` has flushed — the no-data
  * batch that follows a watermark advance fires the timeouts.
  */
class StreamSessionSpec extends SparkSuite {

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
  private def ev(u: Long, sec: Long) = UserEvent(u, ts(sec), "e")

  private def rows(table: String): Set[(Long, Long, Long, Long)] =
    spark.table(table).collect().toSet[org.apache.spark.sql.Row]
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getTimestamp(2).getTime / 1000, r.getLong(3)))

  test("sessions emit once final; idle keys flush via event-time timeout") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[UserEvent]
    val q = Streams.sessionizeStream(in.toDS(), gapSec = 30,
        watermark = "10 seconds")
      .writeStream.format("memory").queryName("sess_final")
      .outputMode("append").start()
    try {
      // two users, one open session each; wm reaches 1000 — short of both
      // closes (1030, 1040) — so nothing may emit
      in.addData(ev(1, 1000), ev(1, 1010), ev(2, 1000))
      q.processAllAvailable()
      assert(rows("sess_final").isEmpty, "no session may emit before its close")

      // wm → 1990: both first sessions flush; u2 has NO data in this batch,
      // so its flush can only be the event-time-timeout path
      in.addData(ev(1, 2000))
      q.processAllAvailable()
      assert(rows("sess_final") ==
        Set((1L, 1000L, 1010L, 2L), (2L, 1000L, 1000L, 1L)),
        "exactly the two watermark-passed sessions, one via timeout")

      // wm → 2990 passes u1's (2000) close but not u2's (3000)
      in.addData(ev(2, 3000))
      q.processAllAvailable()
      assert(rows("sess_final") ==
        Set((1L, 1000L, 1010L, 2L), (2L, 1000L, 1000L, 1L),
          (1L, 2000L, 2000L, 1L)))

      // wm → 3990: the last pending session flushes; nothing re-emits
      in.addData(ev(1, 4000))
      q.processAllAvailable()
      assert(rows("sess_final") ==
        Set((1L, 1000L, 1010L, 2L), (2L, 1000L, 1000L, 1L),
          (1L, 2000L, 2000L, 1L), (2L, 3000L, 3000L, 1L)),
        "each session exactly once — no duplicate emission")
    } finally q.stop()
  }

  test("late event within allowed lateness bridges two pending sessions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[UserEvent]
    val q = Streams.sessionizeStream(in.toDS(), gapSec = 30,
        watermark = "120 seconds")
      .writeStream.format("memory").queryName("sess_bridge")
      .outputMode("append").start()
    try {
      // 1000 and 1060 are 60s apart: two separate pending sessions
      in.addData(ev(3, 1000), ev(3, 1060))
      q.processAllAvailable()
      // 1030 arrives late but admissible (wm = 940): exactly 30s from both
      // neighbors → the three must merge into ONE session
      in.addData(ev(3, 1030))
      q.processAllAvailable()
      assert(rows("sess_bridge").isEmpty, "merged session not yet final")
      // wm → 1180, past the merged close (1090): ONE bridged session
      in.addData(ev(3, 1300))
      q.processAllAvailable()
      assert(rows("sess_bridge") == Set((3L, 1000L, 1060L, 3L)),
        "bridged session must emit as one (start=1000, end=1060, n=3)")
      // wm → 1880 flushes the 1300 session too; bridge row is not re-emitted
      in.addData(ev(3, 2000))
      q.processAllAvailable()
      assert(rows("sess_bridge") ==
        Set((3L, 1000L, 1060L, 3L), (3L, 1300L, 1300L, 1L)))
    } finally q.stop()
  }
}
