package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.Streams

/** Property-based streaming-CDC (SCD2 apply) invariants, fixed-seed
  * scalacheck (the MergeProps pattern): a RANDOM change history — few
  * keys so collisions happen, per-key-unique sequence numbers delivered
  * OUT OF ORDER, duplicate keys inside a batch, value repeats that make
  * the hash-change detector no-op — is split at random batch boundaries
  * and drained through [[Streams.applyChangesScd2]]. After every drain
  * the gold table must equal a sequential Scala fold of the same batches
  * under the declared semantics:
  *
  *  - within a batch, only the highest-sequence change per key applies;
  *  - a change at-or-below the sequence stored on the key's CURRENT row
  *    is stale and dropped (cross-batch guard);
  *  - an applied change with unchanged tracked values is a no-op (so the
  *    stored sequence does NOT advance — the next comparison point is
  *    still the last value-CHANGING sequence);
  *  - a value-changing apply expires the current row (is_current=false,
  *    history kept) and inserts the new current one.
  */
class StreamsCdcProps extends SparkSuite {
  import spark.implicits._

  private case class Ev(key: Long, brand: String, price: Double, seq: Long)
  /** One SCD2 version row as compared: expired rows keep their stored seq. */
  private case class Ver(key: Long, brand: String, price: Double, seq: Long,
      current: Boolean)

  /** Random history: per-key strictly-unique seqs, shuffled delivery. */
  private def history(seed: Long): List[List[Ev]] = {
    val p = Gen.Parameters.default
    def g[A](gen: Gen[A], s: Long): A = gen.apply(p, Seed(s)).get
    val nEv = g(Gen.chooseNum(6, 14), seed)
    val perKeySeq = scala.collection.mutable.Map[Long, Long]()
    val evs = (0 until nEv).map { i =>
      val key = g(Gen.chooseNum(1L, 3L), seed * 1000 + i)
      val brand = g(Gen.oneOf("x", "y"), seed * 2000 + i)
      val price = g(Gen.oneOf(1.0, 2.0, 3.0), seed * 3000 + i)
      val bump = g(Gen.chooseNum(1L, 3L), seed * 4000 + i)
      val seq = perKeySeq.getOrElse(key, 0L) + bump
      perKeySeq(key) = seq
      Ev(key, brand, price, seq)
    }
    // shuffle so later-generated (higher-seq) events can land in EARLIER
    // batches → genuine late arrivals for the cross-batch guard
    // (sort-by-random-key: Gen.pick does not promise a shuffled order)
    val shuffleKey = evs.indices.map(i => g(Gen.chooseNum(0, 1 << 20), seed * 13 + i))
    val shuffled = evs.indices.sortBy(shuffleKey).map(evs).toList
    val nBatches = g(Gen.chooseNum(2, 4), seed * 11 + 3)
    shuffled.grouped(math.max(1, (shuffled.size + nBatches - 1) / nBatches))
      .toList
  }

  /** Sequential oracle fold of one batch into the version state. */
  private def fold(state: List[Ver], batch: List[Ev]): List[Ver] = {
    val latest = batch.groupBy(_.key).values.map(_.maxBy(_.seq)).toList
    if (state.isEmpty) // first load: everything inserted as current
      latest.map(e => Ver(e.key, e.brand, e.price, e.seq, current = true))
    else latest.foldLeft(state) { (st, e) =>
      st.find(v => v.key == e.key && v.current) match {
        case None => Ver(e.key, e.brand, e.price, e.seq, current = true) :: st
        case Some(cur) if e.seq <= cur.seq => st // stale: guard drops it
        case Some(cur) if cur.brand == e.brand && cur.price == e.price =>
          st // unchanged tracked values: hash no-op, stored seq stays
        case Some(cur) =>
          Ver(e.key, e.brand, e.price, e.seq, current = true) ::
            st.map(v => if (v eq cur) v.copy(current = false) else v)
      }
    }
  }

  private def observed(cat: graft.catalog.Catalog, table: String): Set[(Ver, Int)] = {
    val rows = cat.read("gold", table)
      .select("product_id", "brand", "price", "change_seq", "is_current")
      .collect()
      .map(r => Ver(r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4))).toList
    rows.groupBy(identity).map { case (v, g) => (v, g.size) }.toSet
  }

  test("random out-of-order CDC histories: streamed SCD2 == sequential fold") {
    (1 to 3).foreach { c =>
      val batches = history(300L + c)
      val root = tmpDir(s"graft-cdcprops$c")
      val cat = new graft.catalog.Catalog(spark, s"$root/wh")
      val land = new java.io.File(s"$root/landing"); land.mkdirs()
      val fixedNow = to_timestamp(lit("2026-03-01 00:00:00"))
      def drain(): Unit = Streams.applyChangesScd2(
        spark.readStream
          .schema("product_id BIGINT, brand STRING, price DOUBLE, change_seq BIGINT")
          .parquet(land.toString),
        cat, s"cdcprops$c", Seq("product_id"), Seq("brand", "price"),
        "product_skey", s"$root/_cp", fixedNow, sequenceBy = Seq("change_seq"))

      var state = List.empty[Ver]
      batches.zipWithIndex.foreach { case (b, i) =>
        // one file per logical batch so the file source delivers it as
        // exactly one micro-batch
        b.map(e => (e.key, e.brand, e.price, e.seq))
          .toDF("product_id", "brand", "price", "change_seq")
          .coalesce(1)
          .write.mode("append").parquet(land.toString)
        drain()
        state = fold(state, b)
        val want = state.groupBy(identity)
          .map { case (v, g) => (v, g.size) }.toSet
        assert(observed(cat, s"cdcprops$c") == want,
          s"case $c after batch $i: streamed state diverged from fold\n" +
            s"batch=$b")
      }
    }
  }
}
