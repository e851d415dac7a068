package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Audio, Multimodal}
import graft.operators.{ClusterStore, Dedup}

/** The persisted, incrementally-maintained modality cluster store
  * (VERDICT r13 #1 — the IndexDeleteSpec pattern applied per modality).
  * Two equalities per modality, both exact row-set comparisons:
  *
  *   1. MAINTAINED == REBUILT: a store built from generation-0 docs,
  *      appended with generations 1 and 2 (each batch probed against
  *      the persisted signature index only), then delete-maintained
  *      (`doc_id % 7 = 3` taken down), holds EXACTLY the clusters of a
  *      from-scratch build over the live docs. Pairs in every modality
  *      depend only on their two endpoints' signatures, so incremental
  *      edge discovery and delete-then-refold lose nothing.
  *
  *   2. STORE == ONE-SHOT QUERY: a store built over the full corpus
  *      holds exactly the audited one-shot clustering's output (q57
  *      text, q178 image, q198 audio, q199 video) — the equality
  *      q249's persisted-table probe rests on.
  */
class ClusterStoreSpec extends SparkSuite {

  private def docs = Tables.load(spark, sf0001, "documents")

  private def clusterRows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "cluster_id", "is_kept")
      .collect().map(_.toSeq).toSet

  for (spec <- ClusterStore.modalitySpecs) {
    test(s"${spec.name}: maintained (build+append+append+delete) " +
        "equals a from-scratch build over the live docs") {
      val maintained =
        new ClusterStore(spark, tmpDir(s"cs-${spec.name}-m"), spec)
      maintained.build(docs.filter(col("doc_id") % 3 === 0))
      maintained.append(docs.filter(col("doc_id") % 3 === 1))
      maintained.append(docs.filter(col("doc_id") % 3 === 2))
      maintained.delete(_ % 7 === 3)
      val rebuilt =
        new ClusterStore(spark, tmpDir(s"cs-${spec.name}-r"), spec)
      rebuilt.build(docs.filter(col("doc_id") % 7 =!= 3))
      val got = clusterRows(maintained.clusters)
      assert(got.nonEmpty)
      assert(got === clusterRows(rebuilt.clusters))
      // the takedown actually removed the docs from the clusters table
      assert(maintained.clusters
        .filter(col("doc_id") % 7 === 3).count() === 0L)
    }
  }

  test("full-corpus store equals each one-shot clustering query") {
    val root = tmpDir("cs-full")
    ClusterStore.buildAll(spark, sf0001, root)
    def stored(m: String) =
      clusterRows(ClusterStore.storeOf(spark, root, m).clusters)
    assert(stored("text") === clusterRows(
      Dedup.dedupClusters(spark, sf0001)))
    assert(stored("image") === clusterRows(
      Multimodal.imageDedupClusters(spark, sf0001)
        .withColumnRenamed("asset_id", "doc_id")))
    assert(stored("audio") === clusterRows(
      Audio.dedupClustersQuery(spark, sf0001)
        .withColumnRenamed("asset_id", "doc_id")))
    assert(stored("video") === clusterRows(
      Multimodal.videoDedupClusters(spark, sf0001)
        .withColumnRenamed("video", "doc_id")))
  }
}
