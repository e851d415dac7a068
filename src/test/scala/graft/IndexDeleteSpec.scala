package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.layout.{DeletionVectors, FileGranularDml}
import graft.operators.{Dedup, Similarity}

/** Delete-awareness of the PERSISTED secondary indexes (VERDICT r10
  * "Next round" #1): rows deleted from a source table — through EITHER
  * delete mode — must not resurface as dedup verdicts or ANN neighbors.
  *
  * The two modes exercise different machinery:
  *   - copy-on-write ([[FileGranularDml]]) removes rows physically and
  *     leaves NO tombstones → only compaction against the live read can
  *     reconcile the index;
  *   - merge-on-read ([[DeletionVectors]]) leaves rows in place with a
  *     position sidecar → `deletedKeys` yields a bounded tombstone frame
  *     the probe path filters through, no index write needed.
  *
  * The pinned equivalences: a compacted index equals a FRESH REBUILD
  * over the live rows (band keys are per-doc deterministic), and the
  * tombstone-filtered live search equals the search over the compacted
  * index (centroids frozen, budget counts live postings). */
class IndexDeleteSpec extends SparkSuite {

  private def bandsOf(src: String) =
    DeletionVectors.readPath(spark, src)
      .select(col("doc_id"), explode(
        graft.functions.TextFunctions.lshBandKeysOfSet(
          array_distinct(graft.functions.TextFunctions.shingles3(
            col("text"))))).as("band_key"))

  test("band index + copy-on-write delete: compaction equals a fresh " +
      "rebuild over the live docs, and no deleted doc survives") {
    val root = tmpDir("graft-idxdel-band")
    val src = s"$root/documents.parquet"
    Catalog.overwritePath(spark,
      Tables.load(spark, sf0001, "documents").select("doc_id", "text"), src)
    val idx = s"$root/band_index"
    Catalog.appendPath(spark, bandsOf(src), idx,
      commitTag = Some((Dedup.BandRecipeTag, Dedup.BandRecipe)))
    val nBefore = spark.read.parquet(idx).count()

    // copy-on-write delete: rows physically gone, no tombstones to filter
    val nDeleted = FileGranularDml.deleteWhere(spark, src,
      col("doc_id") % 5 === 2)
    assert(nDeleted > 0, "fixture must delete something")
    assert(DeletionVectors.deletedKeys(spark, src, Seq("doc_id")).count()
      == 0, "copy-on-write leaves no tombstones — deletedKeys must be empty")

    val log = Dedup.bandIndexCompact(spark, src, idx).collect()(0)
    assert(log.getAs[Long]("n_removed") > 0)
    assert(log.getAs[Long]("n_removed") + log.getAs[Long]("n_kept")
      == nBefore)

    // compacted index == fresh rebuild over the live rows, exactly
    val compacted = spark.read.parquet(idx)
      .collect().map(_.toSeq).toSet
    val rebuilt = bandsOf(src).collect().map(_.toSeq).toSet
    assert(compacted == rebuilt,
      "compacted band index diverged from a fresh live rebuild")
    // idempotent: a second compaction is a no-op
    val log2 = Dedup.bandIndexCompact(spark, src, idx).collect()(0)
    assert(log2.getAs[Long]("n_removed") == 0)
    // the index recipe tag survives compaction (SQL-visible through
    // SHOW TBLPROPERTIES, which surfaces commit tags)
    assert(Catalog.lastCommitTag(spark, idx, Dedup.BandRecipeTag)
      .contains(Dedup.BandRecipe), "recipe tag lost across OPTIMIZE")
  }

  test("IVF index + copy-on-write delete: compaction drops exactly the " +
      "deleted postings, retires emptied cells, and live search equals " +
      "search over the compacted index") {
    val root = tmpDir("graft-idxdel-ivf-cow")
    val src = s"$root/embeddings.parquet"
    Catalog.overwritePath(spark,
      Tables.load(spark, sf0001, "embeddings").select("vec_id", "embedding"),
      src)
    val indexDir = s"$root/index"
    Similarity.ivfBuildIndex(spark, root, indexDir, maxList = 200)
    val nBefore = spark.read.parquet(s"$indexDir/postings").count()

    val nDeleted = FileGranularDml.deleteWhere(spark, src,
      col("vec_id") % 4 === 1)
    assert(nDeleted > 0)
    // live search BEFORE compaction (no tombstones in CoW — correctness
    // rides the live query set; stale postings only become reachable
    // candidates until compaction, so assert the compaction equivalence
    // AFTER the index debt is repaid)
    val log = Similarity.ivfCompact(spark, src, indexDir).collect()(0)
    assert(log.getAs[Long]("n_removed") == nDeleted,
      "compaction must drop exactly the deleted vectors' postings")
    assert(log.getAs[Long]("n_kept") == nBefore - nDeleted)

    val live = DeletionVectors.readPath(spark, src)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val postIds = spark.read.parquet(s"$indexDir/postings")
      .select("cand_id").collect().map(_.getLong(0)).toSet
    assert(postIds == live, "compacted postings != live rows")
    // centroid table holds no cell without postings
    val cells = spark.read.parquet(s"$indexDir/postings")
      .select("cent_id").distinct().collect().map(_.getLong(0)).toSet
    val centIds = spark.read.parquet(s"$indexDir/centroids")
      .select("cent_id").collect().map(_.getLong(0)).toSet
    assert(centIds == cells, "centroids diverged from live cells")
    // the live-search path over the compacted index returns no deleted id
    val res = Similarity.ivfSearchIndexLive(spark, src, indexDir).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(live(r.getAs[Long]("query_id")))
      assert(live(r.getAs[Long]("cand_id")))
    }
  }

  test("IVF index + merge-on-read delete: tombstone-filtered live search " +
      "returns no deleted id and EQUALS the search after compaction") {
    val root = tmpDir("graft-idxdel-ivf-mor")
    val src = s"$root/embeddings.parquet"
    Catalog.overwritePath(spark,
      Tables.load(spark, sf0001, "embeddings").select("vec_id", "embedding"),
      src)
    val indexDir = s"$root/index"
    Similarity.ivfBuildIndex(spark, root, indexDir, maxList = 200)

    val nDeleted = DeletionVectors.deleteWhere(spark, src,
      col("vec_id") % 4 === 1)
    assert(nDeleted > 0)
    val tombs = DeletionVectors.deletedKeys(spark, src, Seq("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(tombs.size.toLong == nDeleted,
      "deletedKeys must surface exactly the deleted ids")
    assert(tombs.forall(_ % 4 == 1))

    // tombstone-filtered search against the STALE index
    val liveSearch = Similarity.ivfSearchIndexLive(spark, src, indexDir)
      .collect().map(_.toSeq)
    assert(liveSearch.nonEmpty)
    liveSearch.foreach { r =>
      assert(!tombs(r(0).asInstanceOf[Long]), "deleted id queried")
      assert(!tombs(r(2).asInstanceOf[Long]), "deleted id surfaced")
    }
    // compact (repays the debt), search again: IDENTICAL results —
    // centroids frozen, budget probing counted live postings both times
    val log = Similarity.ivfCompact(spark, src, indexDir).collect()(0)
    assert(log.getAs[Long]("n_removed") == nDeleted)
    val compactedSearch = Similarity
      .ivfSearchIndexLive(spark, src, indexDir).collect().map(_.toSeq)
    assert(compactedSearch.toSeq == liveSearch.toSeq,
      "tombstone-filtered search != search over the compacted index")
  }

  test("stale band index + merge-on-read delete: the q233 probe path " +
      "equals a fresh-index run over the live corpus") {
    // deleteAwareDedup internally: full index, DV delete, tombstone-
    // filtered probes. Equivalence target: rebuild the pipeline with the
    // deletes applied FIRST (index only ever sees live docs).
    val stale = Dedup.deleteAwareDedup(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val liveDocs = Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") % 7 =!= 3)
      .select(col("doc_id"),
        (col("doc_id") % 3).cast("int").as("gen"),
        array_distinct(graft.functions.TextFunctions.shingles3(
          col("text"))).as("sh"))
    val ex = liveDocs.select(col("doc_id"), col("gen"),
      explode(graft.functions.TextFunctions.lshBandKeysOfSet(
        col("sh"))).as("band_key"))
    val cand = ex.select(col("doc_id").as("matched_id"),
        col("gen").as("mgen"), col("band_key"))
      .join(ex.select(col("doc_id"), col("gen"), col("band_key")),
        Seq("band_key"))
      .filter(col("mgen") < col("gen"))
      .select("doc_id", "gen", "matched_id").distinct()
    val fresh = cand
      .join(liveDocs.select(col("doc_id"), col("sh").as("sh_a")),
        Seq("doc_id"))
      .join(liveDocs.select(col("doc_id").as("matched_id"),
        col("sh").as("sh_b")), Seq("matched_id"))
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard_ppm", expr(
        "1000000 * inter DIV (size(sh_a) + size(sh_b) - inter)"))
      .filter(col("jaccard_ppm") >= 800000L)
      .groupBy("doc_id", "gen")
      .agg(min(struct(col("matched_id"), col("jaccard_ppm"))).as("m"))
      .select(col("doc_id"), col("gen"),
        col("m.matched_id").as("matched_id"),
        col("m.jaccard_ppm").as("jaccard_ppm"))
      .collect().map(_.toSeq).toSet
    assert(stale == fresh,
      "stale-index delete-aware probe diverged from the fresh live run")
  }
}
