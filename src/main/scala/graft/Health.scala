package graft

import org.apache.spark.sql.SparkSession

/** Process-wide engine HEALTH/DEGRADATION registry — the SQL-visible
  * counterpart of signals that previously lived only in stderr warnings
  * and private counters (VERDICT r13 #3). `SHOW ENGINE HEALTH` surfaces
  * these rows, so an operator can ask the running engine whether any
  * correctness primitive is degraded instead of grepping driver logs:
  *
  *   - `swap.non_atomic_publishes` — how many put-if-absent publishes
  *     fell back to the NON-atomic exists+rename path
  *     ([[graft.layout.SwapProtocol.publishIfAbsent]]); nonzero means
  *     epoch/claim uniqueness is running on the racy fallback and the
  *     store should be looked at.
  *   - `bench.fence_disabled` — the bench harness could not resolve its
  *     source root, so per-query code fences were disabled for that run
  *     (floors may not carry; see Bench's fence notes).
  *   - `epoch_pin.cache_entries` — live entries in the bounded
  *     epoch-pin manifest cache (LRU-capped; hygiene signal).
  *   - `graph.default_wedge_degree_cap` — the declared wedge-adjacency
  *     bound graph operators cap hubs at (the `deg_cap` result column's
  *     default), surfaced next to the per-table operator bounds that
  *     commit tags carry (`ivf.maxList`, `cluster.recipe` — those read
  *     through `SHOW TBLPROPERTIES`).
  *
  * With `FOR <table>`, the table's epoch-pin state is added — which
  * snapshot versions live pipeline-epoch manifests currently protect
  * from vacuum.
  */
object Health {

  /** Set by [[Bench]] when per-query code fences are disabled for the
    * run (unresolvable source root). */
  val benchFenceDisabled =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  def rows(spark: SparkSession,
      tableDir: Option[String]): Seq[(String, String)] = {
    val base = Seq(
      "swap.non_atomic_publishes" ->
        graft.layout.SwapProtocol.nonAtomicPublishes.get.toString,
      "bench.fence_disabled" -> benchFenceDisabled.get.toString,
      "epoch_pin.cache_entries" ->
        graft.catalog.Catalog.epochPinCacheSize.toString,
      "graph.default_wedge_degree_cap" ->
        graft.operators.GraphQueries.DefaultWedgeDegreeCap.toString)
    base ++ tableDir.toSeq.flatMap { dir =>
      val pinned =
        graft.catalog.Catalog.epochProtectedVersions(spark, dir)
      Seq(
        "epoch_pin.pinned_count" -> pinned.size.toString,
        "epoch_pin.pinned_versions" ->
          pinned.toSeq.sorted.mkString(","))
    }
  }
}
