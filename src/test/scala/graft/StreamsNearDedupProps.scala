package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.Streams

/** Property-based invariants for the near-dup ingest gate, fixed-seed
  * scalacheck (the StreamsCdcProps pattern): RANDOM short documents over
  * a tiny vocabulary (so LSH band collisions actually happen), split at
  * random batch boundaries and drained through
  * [[Streams.appendNearDedup]]. After every drain the corpus must equal
  * a sequential Scala fold of the same batches under the declared
  * semantics:
  *
  *  - a doc drops when ANY of its 4 band keys matches the maintained
  *    index (survivors of earlier batches);
  *  - within a batch, a doc drops when any of its bands is shared with a
  *    SMALLER id in the same batch — whether or not that smaller doc
  *    itself survives (the documented conservative transitive drop);
  *  - survivors and ONLY survivors contribute bands to the index.
  *
  * Band keys come from the SAME `lshBandKeysOfSet` column the operator
  * uses, evaluated once in batch mode — the fold reuses the engine's own
  * definition of "collides" rather than re-deriving minhash in Scala.
  */
class StreamsNearDedupProps extends SparkSuite {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def history(seed: Long): List[List[(Long, String)]] = {
    val p = Gen.Parameters.default
    def g[A](gen: Gen[A], s: Long): A = gen.apply(p, Seed(s)).get
    val nDocs = g(Gen.chooseNum(8, 16), seed)
    val docs = (0 until nDocs).map { i =>
      val len = g(Gen.chooseNum(3, 8), seed * 100 + i)
      val ws = (0 until len).map(j =>
        vocab(g(Gen.chooseNum(0, vocab.size - 1), seed * 1000 + i * 31 + j)))
      (i.toLong, ws.mkString(" "))
    }.toList
    val nBatches = g(Gen.chooseNum(2, 4), seed * 11 + 3)
    docs.grouped(math.max(1, (docs.size + nBatches - 1) / nBatches)).toList
  }

  /** Engine-definition band keys for every doc, evaluated once. */
  private def bandsOf(docs: List[(Long, String)]): Map[Long, Set[String]] =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFunctions.lshBandKeysOfSet(
        array_distinct(graft.functions.TextFunctions.words(col("text"))))
        .as("bands"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .toMap

  test("random batched corpora: streamed near-dedup == sequential band fold") {
    (1 to 3).foreach { c =>
      val batches = history(700L + c)
      val bands = bandsOf(batches.flatten)
      val root = tmpDir(s"graft-nddprops$c")
      val cat = new graft.catalog.Catalog(spark, s"$root/wh")
      val land = new java.io.File(s"$root/landing"); land.mkdirs()
      def drain(): Unit = Streams.appendNearDedup(
        spark.readStream.schema("doc_id BIGINT, text STRING")
          .parquet(land.toString),
        cat, "bronze", s"ndd$c", "text", "doc_id", s"$root/_cp")

      var index = Set.empty[String]
      var kept = Set.empty[Long]
      batches.foreach { b =>
        b.toDF("doc_id", "text").coalesce(1)
          .write.mode("append").parquet(land.toString)
        drain()
        val survivors = b.filter { case (id, _) =>
          val bs = bands(id)
          bs.intersect(index).isEmpty &&
            !b.exists { case (oid, _) =>
              oid < id && bands(oid).intersect(bs).nonEmpty }
        }
        kept ++= survivors.map(_._1)
        index ++= survivors.flatMap(s => bands(s._1))
        val observed = cat.read("bronze", s"ndd$c")
          .select("doc_id").as[Long].collect().toSet
        assert(observed == kept,
          s"case $c: corpus ${observed.toList.sorted} != " +
            s"fold ${kept.toList.sorted}")
        val obsBands = cat.read("bronze", s"ndd${c}_bands")
          .select("band_key").as[String].collect().toSet
        assert(obsBands == index,
          s"case $c: band index diverged from survivors' bands")
      }
    }
  }
}
