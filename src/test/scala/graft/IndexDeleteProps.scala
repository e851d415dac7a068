package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.layout.{DeletionVectors, FileGranularDml}
import graft.operators.{Dedup, Similarity}

/** Property fuzz for the delete-aware index surface (the round-11
  * hardening pass over IndexDeleteSpec's fixed cases): random corpora ×
  * random delete predicates × random delete MODE (copy-on-write vs
  * merge-on-read) × SEQUENCES of deletes, asserting the invariants that
  * make serving from a stale index safe —
  *
  *   - a deleted id never queries and never surfaces as a neighbor;
  *   - tombstone-filtered search over the stale index EQUALS the same
  *     search after [[Similarity.ivfCompact]] repays the index debt
  *     (budget probing counts live postings both times);
  *   - a compacted band index equals a FRESH REBUILD over the live rows
  *     and compaction is idempotent — for BOTH delete modes, including
  *     interleaved ones.
  */
class IndexDeleteProps extends SparkSuite {
  import spark.implicits._

  private def writeEmbeddings(src: String, n: Int, seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val df = (0 until n).map { i =>
      (i.toLong, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    Catalog.overwritePath(spark, df, src)
  }

  /** Apply one random delete in a random mode; returns true if the
    * delete was merge-on-read (tombstones left behind). */
  private def randomDelete(src: String, idCol: String,
      rnd: scala.util.Random): Boolean = {
    val m = 2 + rnd.nextInt(5)
    val r = rnd.nextInt(m)
    val cond = col(idCol) % m === r
    val mor = rnd.nextBoolean()
    if (mor) DeletionVectors.deleteWhere(spark, src, cond)
    else FileGranularDml.deleteWhere(spark, src, cond)
    mor
  }

  test("IVF: stale-index live search == post-compaction search, no " +
      "deleted id served, across random delete sequences in both modes") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 6361L)
      val root = tmpDir(s"graft-idxdel-prop-$seed")
      val src = s"$root/embeddings.parquet"
      writeEmbeddings(src, 250 + rnd.nextInt(150), seed * 523L)
      val indexDir = s"$root/index"
      Similarity.ivfBuildIndex(spark, root, indexDir, maxList = 200)
      for (round <- 1 to 2) {
        val mor = randomDelete(src, "vec_id", rnd)
        val live = DeletionVectors.readPath(spark, src)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        // merge-on-read leaves tombstones, so serving from the STALE
        // index is already exact; copy-on-write leaves none — its stale
        // postings are only reconciled by compaction (the IndexDeleteSpec
        // caveat), so the pre-compaction assertions apply to MoR only
        val stale =
          if (mor) {
            val s = Similarity.ivfSearchIndexLive(spark, src, indexDir)
              .collect().map(_.toSeq)
            s.foreach { r =>
              assert(live(r(0).asInstanceOf[Long]),
                s"seed $seed round $round: deleted id queried")
              assert(live(r(2).asInstanceOf[Long]),
                s"seed $seed round $round: deleted id surfaced as neighbor")
            }
            Some(s)
          } else None
        // repay the index debt: MoR serving identical before/after
        Similarity.ivfCompact(spark, src, indexDir)
        val compacted = Similarity
          .ivfSearchIndexLive(spark, src, indexDir).collect().map(_.toSeq)
        compacted.foreach { r =>
          assert(live(r(0).asInstanceOf[Long]) &&
            live(r(2).asInstanceOf[Long]),
            s"seed $seed round $round: deleted id served post-compaction")
        }
        stale.foreach(s => assert(s.toSeq == compacted.toSeq,
          s"seed $seed round $round: stale-filtered != compacted search"))
        // the compacted index holds exactly the live rows, and the
        // centroid table exactly the cells that still have postings
        val postIds = spark.read.parquet(s"$indexDir/postings")
          .select("cand_id").collect().map(_.getLong(0)).toSet
        assert(postIds == live,
          s"seed $seed round $round: postings != live rows")
        val cells = spark.read.parquet(s"$indexDir/postings")
          .select("cent_id").distinct().collect().map(_.getLong(0)).toSet
        val cents = spark.read.parquet(s"$indexDir/centroids")
          .select("cent_id").collect().map(_.getLong(0)).toSet
        assert(cents == cells,
          s"seed $seed round $round: centroids diverged from live cells")
      }
    }
  }

  test("band index: compaction == fresh rebuild over live docs and is " +
      "idempotent, across random corpora and delete sequences") {
    val vocab = Array("alpha", "bravo", "china", "delta", "echo1",
      "fox22", "golf3", "hotel", "india", "jules")
    def bandsOf(src: String) =
      DeletionVectors.readPath(spark, src)
        .select(col("doc_id"), explode(
          graft.functions.TextFunctions.lshBandKeysOfSet(
            array_distinct(graft.functions.TextFunctions.shingles3(
              col("text"))))).as("band_key"))
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 7727L)
      val root = tmpDir(s"graft-banddel-prop-$seed")
      val src = s"$root/documents.parquet"
      // random docs; every third a mutated copy of its predecessor, so
      // the index holds real shared bands that compaction must keep
      val texts = new scala.collection.mutable.ArrayBuffer[String]
      val docs = (0 until 120).map { i =>
        val t =
          if (i % 3 == 2 && texts.nonEmpty)
            texts.last + " " + vocab(rnd.nextInt(vocab.length))
          else Array.fill(8 + rnd.nextInt(8))(
            vocab(rnd.nextInt(vocab.length))).mkString(" ")
        texts += t
        (i.toLong, t)
      }
      Catalog.overwritePath(spark, docs.toDF("doc_id", "text"), src)
      val idx = s"$root/band_index"
      Catalog.appendPath(spark, bandsOf(src), idx)
      for (round <- 1 to 2) {
        randomDelete(src, "doc_id", rnd)
        Dedup.bandIndexCompact(spark, src, idx)
        val compacted = spark.read.parquet(idx)
          .collect().map(_.toSeq).toSet
        val rebuilt = bandsOf(src).collect().map(_.toSeq).toSet
        assert(compacted == rebuilt,
          s"seed $seed round $round: compacted index != fresh rebuild")
        val log2 = Dedup.bandIndexCompact(spark, src, idx).collect()(0)
        assert(log2.getAs[Long]("n_removed") == 0,
          s"seed $seed round $round: compaction not idempotent")
      }
    }
  }
}
