package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.pipeline.MaterializedJoin

class MaterializedJoinSpec extends SparkSuite {
  import spark.implicits._

  private def mkView(root: String): (Catalog, MaterializedJoin) = {
    val cat = new Catalog(spark, s"$root/wh")
    // fact: (order id, customer fk, amount); dim: (customer, name)
    cat.overwriteSnapshot(Seq(
      (1L, 10L, 5.0), (2L, 11L, 6.0), (3L, 12L, 7.0), (4L, 10L, 8.0))
      .toDF("oid", "cust", "amt"), "silver", "fact")
    cat.overwriteSnapshot(Seq(
      (10L, "alice"), (11L, "bob"))
      .toDF("c_id", "c_name"), "silver", "dim")
    val mj = new MaterializedJoin(spark,
      cat.path("silver", "fact"), Seq("oid"), "cust",
      cat.path("silver", "dim"), "c_id", Seq("c_name"),
      s"$root/view", nBuckets = 8)
    mj.build()
    (cat, mj)
  }

  /** The invariant after any refresh: view == full re-join from scratch. */
  private def assertConverged(cat: Catalog, mj: MaterializedJoin): Unit = {
    val expect = cat.read("silver", "fact")
      .join(cat.read("silver", "dim"),
        col("cust") === col("c_id"), "left_outer")
      .select(col("oid"), col("cust"), col("amt"), col("c_name"))
    assert(rowsOf(mj.read(), "oid") == rowsOf(expect, "oid"),
      "view diverged from the full join")
  }

  test("build materializes the full left join, unmatched fk as NULL dim cols") {
    val (cat, mj) = mkView(tmpDir("graft-mj-build"))
    assertConverged(cat, mj)
    // customer 12 has no dim row yet → NULL name, row still present
    val r12 = mj.read().filter(col("cust") === 12L).collect()
    assert(r12.length == 1 && r12.head.isNullAt(3))
    // a fresh build refuses to clobber
    intercept[IllegalArgumentException] { mj.build() }
    // in-sync refresh is a no-op
    assert(mj.refresh() == ((Nil, Nil)))
  }

  test("fact appends join the current dim and land O(batch), not O(view)") {
    val root = tmpDir("graft-mj-fact")
    val (cat, mj) = mkView(root)
    Catalog.appendPath(spark,
      Seq((5L, 11L, 9.0), (6L, 13L, 1.0)).toDF("oid", "cust", "amt"),
      cat.path("silver", "fact"))
    val (dimB, factB) = mj.refresh()
    assert(dimB.isEmpty, "no dim change, yet dim buckets rewrote")
    assert(factB.nonEmpty && factB.size <= 2,
      s"append of 2 join keys touched ${factB.size} buckets")
    assertConverged(cat, mj)
    // the new bob row carries the dim value; the unknown customer is NULL
    assert(mj.read().filter(col("oid") === 5L)
      .select("c_name").as[String].head() == "bob")
    assert(mj.read().filter(col("oid") === 6L).head().isNullAt(3))
  }

  test("dim insert/update/delete rewrite only dependent buckets") {
    val root = tmpDir("graft-mj-dim")
    val (cat, mj) = mkView(root)
    // late-arriving dim row (12), SCD1 rename (11), delete (10)
    cat.overwriteSnapshot(Seq(
      (11L, "robert"), (12L, "carol"))
      .toDF("c_id", "c_name"), "silver", "dim")
    val (dimB, factB) = mj.refresh()
    assert(factB.isEmpty, "no fact change, yet fact buckets rewrote")
    assert(dimB.nonEmpty)
    assertConverged(cat, mj)
    val byOid = mj.read().collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(byOid(2L).contains("robert"), "SCD1 update not applied")
    assert(byOid(3L).contains("carol"), "late-arriving dim did not fill")
    assert(byOid(1L).isEmpty && byOid(4L).isEmpty,
      "deleted dim rows must leave NULLs")
  }

  test("a fact update that moves the join key leaves no stale row behind") {
    val root = tmpDir("graft-mj-move")
    val (cat, mj) = mkView(root)
    // order 1 moves from customer 10 to 11 (the preimage's bucket must be
    // cleaned even though the postimage lands elsewhere)
    cat.overwriteSnapshot(Seq(
      (1L, 11L, 5.5), (2L, 11L, 6.0), (3L, 12L, 7.0), (4L, 10L, 8.0))
      .toDF("oid", "cust", "amt"), "silver", "fact")
    mj.refresh()
    assertConverged(cat, mj)
    assert(mj.read().filter(col("oid") === 1L).count() == 1,
      "moved row duplicated or lost")
    assert(mj.read().filter(col("oid") === 1L)
      .select("c_name").as[String].head() == "bob")
  }

  test("replayed refresh is harmless (cursor rolled back after apply)") {
    val root = tmpDir("graft-mj-replay")
    val (cat, mj) = mkView(root)
    val fCursor = s"$root/view.cursors/fact"
    val before = graft.catalog.ChangeFeed.readCursor(spark, fCursor).get
    Catalog.appendPath(spark,
      Seq((7L, 10L, 2.0)).toDF("oid", "cust", "amt"),
      cat.path("silver", "fact"))
    mj.refresh()
    assertConverged(cat, mj)
    // crash-between-apply-and-cursor-commit: roll the cursor back and
    // re-pull — the upsert must not duplicate order 7
    graft.catalog.ChangeFeed.commitCursor(spark, fCursor, before)
    mj.refresh()
    assertConverged(cat, mj)
    assert(mj.read().filter(col("oid") === 7L).count() == 1)
  }

  test("declarative IncrementalJoin node builds then refreshes across graph runs") {
    import graft.pipeline.PipelineGraph
    val root = tmpDir("graft-mj-graph")
    val cat = new Catalog(spark, s"$root/wh")
    cat.overwriteSnapshot(Seq((1L, 10L, 5.0), (2L, 11L, 6.0))
      .toDF("oid", "cust", "amt"), "silver", "fact")
    cat.overwriteSnapshot(Seq((10L, "alice"), (11L, "bob"))
      .toDF("c_id", "c_name"), "silver", "dim")
    def graph = new PipelineGraph(spark, cat)
      .table("gold.orders_wide", inputs = Nil,
        materialize = PipelineGraph.IncrementalJoin(
          "silver.fact", Seq("oid"), "cust",
          "silver.dim", "c_id", Seq("c_name"), nBuckets = 8))(
        _ => spark.range(0).toDF())
    graph.run()
    val path = cat.path("gold", "orders_wide")
    assert(graft.merge.PartitionedMerge.read(spark, path).count() == 2)
    // source changes; second graph run refreshes incrementally
    Catalog.appendPath(spark, Seq((3L, 10L, 7.0)).toDF("oid", "cust", "amt"),
      cat.path("silver", "fact"))
    cat.overwriteSnapshot(Seq((10L, "alicia"), (11L, "bob"))
      .toDF("c_id", "c_name"), "silver", "dim")
    graph.run()
    val got = graft.merge.PartitionedMerge.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(1L -> "alicia", 2L -> "bob", 3L -> "alicia"),
      s"graph refresh diverged: $got")
  }

  test("the view is itself versioned: refresh commits a time-travelable version") {
    val root = tmpDir("graft-mj-vers")
    val (cat, mj) = mkView(root)
    Catalog.appendPath(spark,
      Seq((8L, 11L, 3.0)).toDF("oid", "cust", "amt"),
      cat.path("silver", "fact"))
    mj.refresh()
    // pre-refresh state is addressable through the bucket version log
    val v1 = graft.merge.PartitionedMerge
      .readVersion(spark, s"$root/view", 1)
    assert(v1.count() == 4 && mj.read().count() == 5)
  }
}
