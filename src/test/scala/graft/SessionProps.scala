package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.Streams
import graft.streaming.Streams.UserEvent

/** Property-based sessionization invariants (fixed-seed scalacheck, the
  * MergeProps pattern) for [[Streams.sessionizeStream]]: a RANDOM event
  * history — duplicate timestamps, heavy cross-batch reordering — is
  * delivered through arbitrary micro-batch boundaries with a watermark
  * delay wide enough that NOTHING is late. After a final watermark-advancing
  * flush, the emitted sessions must equal the batch gaps-and-islands fold
  * over the full history (streaming/batch equivalence), each exactly once;
  * and at every intermediate drain the emitted set must be a subset of
  * that final answer (no session ever emits in a shape a later admissible
  * event would have changed).
  */
class SessionProps extends SparkSuite {

  private val gapSec = 30L
  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** Batch oracle: per-user sorted gaps-and-islands merge. */
  private def foldSessions(evs: Seq[(Long, Long)]): Set[(Long, Long, Long, Long)] =
    evs.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.map(_._2).sorted
      sorted.tail.foldLeft(List((sorted.head, sorted.head, 1L))) {
        case ((s, e, n) :: rest, t) =>
          if (t - e <= gapSec) (s, math.max(e, t), n + 1) :: rest
          else (t, t, 1L) :: (s, e, n) :: rest
        case (Nil, t) => List((t, t, 1L))
      }.map { case (s, e, n) => (u, s, e, n) }
    }.toSet

  private def history(seed: Long): List[List[(Long, Long)]] = {
    val p = Gen.Parameters.default
    def g[A](gen: Gen[A], s: Long): A = gen.apply(p, Seed(s)).get
    val nEv = g(Gen.chooseNum(10, 24), seed)
    val evs = (0 until nEv).map { i =>
      (g(Gen.chooseNum(1L, 2L), seed * 31 + i),     // user
        // seconds start at 1: Spark's late filter drops eventTime <= the
        // watermark INCLUSIVE and the initial watermark is 0, so an
        // epoch-0 event is undeliverable by Spark semantics (the first
        // run of this suite found exactly that)
        g(Gen.chooseNum(1L, 300L), seed * 53 + i))   // second
    }
    // random delivery order (sort by random key), random batch boundaries
    val keys = evs.indices.map(i => g(Gen.chooseNum(0, 1 << 20), seed * 97 + i))
    val shuffled = evs.indices.sortBy(keys).map(evs).toList
    val nBatches = g(Gen.chooseNum(2, 5), seed * 7 + 1)
    shuffled.grouped(math.max(1, (shuffled.size + nBatches - 1) / nBatches))
      .toList
  }

  test("random reordered histories: streamed sessions == batch fold, exactly once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    (1 to 3).foreach { c =>
      val batches = history(5000L + c)
      val expected = foldSessions(batches.flatten)
      val in = MemoryStream[UserEvent]
      val name = s"sess_props$c"
      // delay 400s > max event time: no event in [0, 300] is ever late
      val q = Streams.sessionizeStream(in.toDS(), gapSec = gapSec,
          watermark = "400 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        def emitted(): Seq[(Long, Long, Long, Long)] =
          spark.table(name).collect().toSeq
            .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
              r.getTimestamp(2).getTime / 1000, r.getLong(3)))
        batches.foreach { b =>
          in.addData(b.map { case (u, s) => UserEvent(u, ts(s), "e") }: _*)
          q.processAllAvailable()
          val got = emitted()
          assert(got.toSet.subsetOf(expected),
            s"case $c: mid-stream emission not in the batch answer: " +
              s"${got.toSet -- expected}")
          assert(got.size == got.toSet.size,
            s"case $c: duplicate mid-stream emission")
        }
        // sentinel flush: watermark → 9600, far past every close ≤ 330
        in.addData(UserEvent(99L, ts(10000L), "e"))
        q.processAllAvailable()
        val fin = emitted()
        assert(fin.size == fin.toSet.size, s"case $c: duplicate emission")
        assert(fin.toSet == expected,
          s"case $c: final sessions diverge from the batch fold")
      } finally q.stop()
    }
  }
}
