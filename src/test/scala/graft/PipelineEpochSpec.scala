package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.pipeline.{PipelineEpoch, PipelineGraph}

/** Cross-table consistency through [[PipelineEpoch]]: a crash between a
  * graph's dim commit and fact commit must leave epoch readers on the
  * complete OLD generation (all-old), and a successful re-run must move
  * them to the complete NEW one (all-new) — never a mix (the window the
  * per-table version log alone cannot close). */
class PipelineEpochSpec extends SparkSuite {
  import spark.implicits._

  private val Pipe = "goldrun"

  /** dim commits first (fact depends on it); `failFact` injects the
    * crash AFTER the dim commit, BEFORE the fact commit — the exact
    * mixed-generation window. */
  private def graph(cat: Catalog, src: DataFrame, failFact: Boolean)
      : PipelineGraph = {
    new PipelineGraph(spark, cat)
      .table("gold.dim", inputs = Seq("src")) { in =>
        in("src").select(col("id"), col("attr"))
      }
      .table("gold.fact", inputs = Seq("src", "gold.dim")) { in =>
        if (failFact) throw new RuntimeException("injected crash")
        in("src").groupBy("attr").agg(count(lit(1)).as("n"))
      }
  }

  test("epoch readers see all-old across a mid-run crash, all-new after " +
      "the re-run; direct reads show the mixed state the epoch hides") {
    val cat = new Catalog(spark, tmpDir("graft-epoch"))
    val gen1 = Seq((1L, "a"), (2L, "b")).toDF("id", "attr")
    val r1 = graph(cat, gen1, failFact = false)
      .run(Map("src" -> gen1), epoch = Some(Pipe))
    assert(r1.epoch.contains(1))
    assert(PipelineEpoch.currentEpoch(spark, cat, Pipe) == 1)
    val dim1 = PipelineEpoch.read(spark, cat, Pipe, "gold.dim")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val fact1 = PipelineEpoch.read(spark, cat, Pipe, "gold.fact")
      .orderBy("attr").collect().map(_.toSeq).toSeq
    assert(dim1 == Seq(Seq(1L, "a"), Seq(2L, "b")))
    assert(fact1.map(_.head) == Seq("a", "b"))

    // generation 2 run CRASHES between the dim and fact commits
    val gen2 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "attr")
    intercept[RuntimeException] {
      graph(cat, gen2, failFact = true)
        .run(Map("src" -> gen2), epoch = Some(Pipe))
    }
    // direct table reads now show the MIXED state (new dim, old fact)…
    assert(cat.read("gold", "dim").count() == 3)
    assert(cat.read("gold", "fact").count() == 2)
    // …but the epoch pointer never advanced: epoch readers stay ALL-OLD
    assert(PipelineEpoch.currentEpoch(spark, cat, Pipe) == 1)
    val dimAfterCrash = PipelineEpoch.read(spark, cat, Pipe, "gold.dim")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val factAfterCrash = PipelineEpoch.read(spark, cat, Pipe, "gold.fact")
      .orderBy("attr").collect().map(_.toSeq).toSeq
    assert(dimAfterCrash == dim1, "epoch read leaked the half-committed dim")
    assert(factAfterCrash == fact1)

    // the re-run commits both nodes and publishes epoch 2: ALL-NEW
    val r2 = graph(cat, gen2, failFact = false)
      .run(Map("src" -> gen2), epoch = Some(Pipe))
    assert(r2.epoch.contains(2))
    val dim2 = PipelineEpoch.read(spark, cat, Pipe, "gold.dim")
    val fact2 = PipelineEpoch.read(spark, cat, Pipe, "gold.fact")
    assert(dim2.count() == 3)
    assert(fact2.orderBy("attr").collect().map(_.getString(0)).toSeq ==
      Seq("a", "b", "c"))
    // a consumer pinned to epoch 1 still sees the old generation intact
    assert(PipelineEpoch.readAt(spark, cat, Pipe, "gold.dim", 1)
      .count() == 2)
  }

  test("a linked manifest IS the publication: a crash right after the " +
      "link loses nothing, stale _current hints are ignored, and " +
      "retention prunes old epochs") {
    val cat = new Catalog(spark, tmpDir("graft-epoch-heal"))
    val df = Seq((1L, "x")).toDF("id", "attr")
    cat.create(df, "gold", "t")
    assert(PipelineEpoch.commit(spark, cat, Pipe, Seq("gold.t")) == 1)
    // a committer that crashed immediately after its atomic link has a
    // complete, visible manifest and a stale hint — readers must serve
    // it (the manifest is the authority, the hint is not)
    val dir = new org.apache.hadoop.fs.Path(
      cat.path("_pipeline_epochs", Pipe))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(dir, "epoch_v2")
    val out = fs.create(orphan, true)
    out.write("gold.t\t1".getBytes("UTF-8")); out.close()
    assert(PipelineEpoch.currentEpoch(spark, cat, Pipe) == 2)
    assert(PipelineEpoch.tableVersions(spark, cat, Pipe, 2) ==
      Map("gold.t" -> 1))
    // the next commit takes the next number
    assert(PipelineEpoch.commit(spark, cat, Pipe, Seq("gold.t")) == 3)
    // retention bounds the manifest listing
    (4 to 25).foreach { i =>
      assert(PipelineEpoch.commit(spark, cat, Pipe, Seq("gold.t"),
        keepEpochs = 5) == i)
    }
    assert(PipelineEpoch.currentEpoch(spark, cat, Pipe) == 25)
    assert(PipelineEpoch.tableVersions(spark, cat, Pipe, 25).nonEmpty)
    intercept[IllegalArgumentException] {
      PipelineEpoch.tableVersions(spark, cat, Pipe, 3) // pruned
    }
  }

  test("racing epoch commits serialize: distinct consecutive numbers, " +
      "every manifest readable, pointer lands at the max") {
    val cat = new Catalog(spark, tmpDir("graft-epoch-race"))
    val df = Seq((1L, "x")).toDF("id", "attr")
    cat.create(df, "gold", "t")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      val fs = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            start.await(10, java.util.concurrent.TimeUnit.SECONDS)
            PipelineEpoch.commit(spark, cat, Pipe, Seq("gold.t"))
          }
        })
      }
      start.countDown()
      val got = fs.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
        .sorted
      assert(got == Seq(1, 2, 3, 4), s"epoch numbers collided: $got")
      assert(PipelineEpoch.currentEpoch(spark, cat, Pipe) == 4)
      got.foreach { e =>
        assert(PipelineEpoch.tableVersions(spark, cat, Pipe, e) ==
          Map("gold.t" -> 1))
      }
    } finally pool.shutdown()
  }

  test("vacuum pins every version a live epoch references: readAt " +
      "succeeds for all retained epochs past keepVersions, unreferenced " +
      "versions still reclaim, and pins release as epochs age out") {
    // keepVersions=2 « epochs committed: the windows cross by design
    val cat = new Catalog(spark, tmpDir("graft-epoch-vac"),
      keepVersions = 2)
    cat.create(Seq((0L, "g0")).toDF("id", "attr"), "gold", "t")
    PipelineEpoch.commit(spark, cat, Pipe, Seq("gold.t"))
    (1 to 7).foreach { i =>
      cat.overwriteSnapshot(Seq((i.toLong, s"g$i")).toDF("id", "attr"),
        "gold", "t")
      PipelineEpoch.commit(spark, cat, Pipe, Seq("gold.t"))
    }
    // version 8 live, epochs 1..8 recording versions 1..8; vacuum with
    // keepVersions=2 would reclaim v1..v5 — all epoch-pinned
    val deleted = cat.vacuum("gold", "t")
    (1 to 8).foreach { e =>
      val rows = PipelineEpoch.readAt(spark, cat, Pipe, "gold.t", e)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq(((e - 1).toLong, s"g${e - 1}")),
        s"epoch $e unreadable after vacuum: $rows (deleted: $deleted)")
    }
    // now age the epochs out (keepEpochs=3 prunes manifests ≤ 6 once
    // epoch 9 commits) — the released versions reclaim on the next pass
    cat.overwriteSnapshot(Seq((8L, "g8")).toDF("id", "attr"), "gold", "t")
    PipelineEpoch.commit(spark, cat, Pipe, Seq("gold.t"), keepEpochs = 3)
    val deleted2 = cat.vacuum("gold", "t")
    assert(deleted2.exists(_.contains("v00001")),
      s"unpinned version v1 not reclaimed: $deleted2")
    // retained epochs (7, 8, 9) still read
    (7 to 9).foreach { e =>
      assert(PipelineEpoch.readAt(spark, cat, Pipe, "gold.t", e)
        .count() == 1)
    }
  }

  test("a commit merges against the newest epoch: a higher epoch never " +
      "records an older table version (race-loser regression guard)") {
    val cat = new Catalog(spark, tmpDir("graft-epoch-mono"))
    val df = Seq((1L, "x")).toDF("id", "attr")
    cat.create(df, "gold", "t") // version 1
    // hand-publish epoch 1 recording a version AHEAD of our pointer
    // read — the state a racing winner leaves when its table commit +
    // epoch publish land between a loser's pointer read and publish
    val dir = cat.path("_pipeline_epochs", Pipe)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val m = f.create(new org.apache.hadoop.fs.Path(dir, "epoch_v1"), true)
    try m.write("gold.t\t7".getBytes("UTF-8")) finally m.close()
    // the loser's commit (fresh read = 1) must publish max(1, 7) = 7,
    // not regress epoch 2 below what epoch 1 already recorded
    assert(PipelineEpoch.commit(spark, cat, Pipe, Seq("gold.t")) == 2)
    assert(PipelineEpoch.tableVersions(spark, cat, Pipe, 2) ==
      Map("gold.t" -> 7))
  }

  test("interleaved table writes + epoch commits keep per-table versions " +
      "monotone across epoch order") {
    val cat = new Catalog(spark, tmpDir("graft-epoch-mono2"))
    cat.create(Seq((1L, "x")).toDF("id", "attr"), "gold", "t")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      val fs = (1 to 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            start.await(10, java.util.concurrent.TimeUnit.SECONDS)
            (1 to 3).foreach { j =>
              var done = false
              while (!done)
                try {
                  cat.overwriteSnapshot(
                    Seq((i * 10L + j, "x")).toDF("id", "attr"), "gold", "t")
                  done = true
                } catch {
                  case _: Catalog.ConcurrentCommitException =>
                    Thread.sleep(10)
                }
              PipelineEpoch.commit(spark, cat, Pipe, Seq("gold.t"))
            }
          }
        })
      }
      start.countDown()
      fs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      val top = PipelineEpoch.currentEpoch(spark, cat, Pipe)
      assert(top == 12)
      val vs = (1 to top).map(e =>
        PipelineEpoch.tableVersions(spark, cat, Pipe, e)("gold.t"))
      assert(vs == vs.sorted,
        s"epoch-ordered versions regressed: $vs")
    } finally pool.shutdown()
  }

  test("epoch-pin cache: LRU-bounded, a miss re-parses correctly, and a " +
      "recreated warehouse's same-named manifests are not served stale") {
    val prevCap = Catalog.epochPinCacheCap
    Catalog.epochPinCacheCap = 4
    // the cache is process-wide and eviction removes ONE eldest entry
    // per put — start from empty or entries left by earlier suites keep
    // the size above the shrunken cap no matter how many puts follow
    Catalog.epochPinCacheClear()
    try {
      def mkWarehouse(i: Int): (Catalog, String) = {
        val cat = new Catalog(spark, tmpDir(s"graft-pincache-$i"))
        cat.create(Seq((i.toLong, i.toLong)).toDF("id", "v"), "gold", "t")
        PipelineEpoch.commit(spark, cat, "p", Seq("gold.t"))
        (cat, cat.path("gold", "t"))
      }
      val whs = (1 to 6).map(mkWarehouse)
      // touching 6 pipelines through the pin sweep fills then evicts
      whs.foreach { case (_, dir) =>
        Catalog.epochProtectedVersions(spark, dir) }
      assert(Catalog.epochPinCacheSize <= 4,
        s"cache not bounded: ${Catalog.epochPinCacheSize}")
      // evicted entry re-parses correctly on the next sweep (a miss is
      // a re-read, never a wrong answer)
      assert(Catalog.epochProtectedVersions(spark, whs.head._2) ==
        Set(1))
      // recreated warehouse at the SAME path: epoch_v1 repeats its NAME
      // with different contents (another table name → another length);
      // the (name, mtime, len) fingerprint must invalidate the cache
      val root = tmpDir("graft-pincache-recreate")
      def recreate(table: String): Catalog = {
        val f = new org.apache.hadoop.fs.Path(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        f.delete(new org.apache.hadoop.fs.Path(root), true)
        val cat = new Catalog(spark, root)
        cat.create(Seq((1L, 1L)).toDF("id", "v"), "gold", table)
        PipelineEpoch.commit(spark, cat, "p", Seq(s"gold.$table"))
        cat
      }
      val c1 = recreate("t")
      assert(Catalog.epochProtectedVersions(spark, c1.path("gold", "t"))
        == Set(1))
      val c2 = recreate("longer_name")
      assert(Catalog.epochProtectedVersions(spark,
        c2.path("gold", "longer_name")) == Set(1),
        "stale cache served the old warehouse's pins for gold.t")
      assert(Catalog.epochProtectedVersions(spark, c2.path("gold", "t"))
        == Set.empty,
        "recreated warehouse still pins the DELETED table's versions")
      // SAME-FINGERPRINT recreation: "ta" -> "tb" republishes epoch_v1
      // with identical byte length, and the new manifest's mtime is
      // forced equal to the old one (the collision a 1 s-granularity
      // object store produces on its own) — the (name, mtime, len)
      // token is then IDENTICAL across the recreation while the cache
      // still holds the OLD warehouse's parse, so only the
      // per-pipeline _instance UUID in the cache KEY stops the sweep
      // from serving the old pins. The recreation is hand-built (bytes
      // written directly, no sweep in between) to pin exactly that
      // adversarial interleaving.
      val c3 = recreate("ta")
      assert(Catalog.epochProtectedVersions(spark, c3.path("gold", "ta"))
        == Set(1)) // <- caches {ta -> 1} for this pipeline
      val fsR = new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val manifestP = new org.apache.hadoop.fs.Path(
        s"$root/_pipeline_epochs/p/epoch_v1")
      val oldSt = fsR.getFileStatus(manifestP)
      def put(p: org.apache.hadoop.fs.Path, text: String): Unit = {
        val o = fsR.create(p, true)
        try o.write(text.getBytes("UTF-8")) finally o.close()
      }
      fsR.delete(new org.apache.hadoop.fs.Path(root), true)
      val c4 = new Catalog(spark, root)
      c4.create(Seq((1L, 1L)).toDF("id", "v"), "gold", "tb")
      put(manifestP, "gold.tb\t1") // same length as "gold.ta\t1"
      put(new org.apache.hadoop.fs.Path(s"$root/_pipeline_epochs/p/" +
        PipelineEpoch.InstanceFile),
        java.util.UUID.randomUUID().toString)
      assert(fsR.getFileStatus(manifestP).getLen == oldSt.getLen,
        "fixture drift: ta/tb manifests must have equal lengths")
      fsR.setTimes(manifestP, oldSt.getModificationTime, -1)
      assert(Catalog.epochProtectedVersions(spark, c4.path("gold", "tb"))
        == Set(1),
        "stale cache served the old same-fingerprint warehouse's pins")
      assert(Catalog.epochProtectedVersions(spark, c4.path("gold", "ta"))
        == Set.empty,
        "same-fingerprint recreation still pins the DELETED table's versions")
    } finally Catalog.epochPinCacheCap = prevCap
  }

  test("a writer landing BETWEEN the commit's per-table pointer reads " +
      "cannot produce a mixed-generation manifest (read-until-stable)") {
    val cat = new Catalog(spark, tmpDir("graft-epoch-stable"))
    // two tables written in LOCKSTEP: a real cross-table state always
    // has equal versions, so any manifest recording a != b is mixed
    def writeGen(g: Int): Unit = {
      val df = Seq((g.toLong, g.toLong)).toDF("id", "g")
      if (g == 1) { cat.create(df, "gold", "a"); cat.create(df, "gold", "b") }
      else {
        cat.overwriteSnapshot(df, "gold", "a")
        cat.overwriteSnapshot(df, "gold", "b")
      }
    }
    writeGen(1)
    // the seam fires after EVERY per-table pointer read; advance both
    // tables on the first few reads so the commit's first snapshot
    // passes are GUARANTEED torn (table a read at gen g, table b at
    // g+1) and only a later stable pair can publish
    val gen = new java.util.concurrent.atomic.AtomicInteger(1)
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    PipelineEpoch.onSnapshotRead = () => {
      if (fired.incrementAndGet() <= 3) writeGen(gen.incrementAndGet())
    }
    try {
      val ep = PipelineEpoch.commit(spark, cat, "stable",
        Seq("gold.a", "gold.b"))
      val vs = PipelineEpoch.tableVersions(spark, cat, "stable", ep)
      assert(fired.get() > 2, "seam never fired — test wiring broken")
      assert(vs("gold.a") == vs("gold.b"),
        s"published manifest is mixed-generation: $vs")
    } finally PipelineEpoch.onSnapshotRead = () => ()
  }
}
