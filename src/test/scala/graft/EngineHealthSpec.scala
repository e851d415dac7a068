package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.catalog.Catalog
import graft.layout.SwapProtocol
import graft.pipeline.PipelineEpoch

/** `SHOW ENGINE HEALTH [FOR <table>]` (VERDICT r13 #3): the degradation
  * signals that used to live in stderr warnings and private counters
  * must be SQL-visible. The fallback case is FORCED for real: a staged
  * file on tmpfs and a target on /tmp cross filesystems, so `link(2)`
  * fails with EXDEV on every attempt and `publishIfAbsent` degrades to
  * the observable rename path — the publish still succeeds, and the
  * counter moves where SQL can see it. */
class EngineHealthSpec extends SparkSuite {

  /** Extension-enabled session (the MergeSqlSpec pattern) so the
    * statement parses through the injected parser path too. */
  private lazy val sqlSpark: SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-health-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private def healthMap(s: SparkSession, sql: String): Map[String, String] =
    s.sql(sql).collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("SHOW ENGINE HEALTH reports the forced non-atomic-publish " +
      "degradation through both parser paths") {
    val before = SwapProtocol.nonAtomicPublishes.get()
    // force EXDEV: staged on tmpfs, target on /tmp — link(2) cannot
    // cross filesystems, so after bounded retries the publish degrades
    // (and still lands through rename). Guarded: hosts without a
    // /dev/shm mount (macOS, slim containers), or where it resolves to
    // the same filesystem as the target, cannot force the degradation —
    // skip rather than fail/invert there.
    val shm = java.nio.file.Paths.get("/dev/shm")
    assume(java.nio.file.Files.isDirectory(shm) &&
      java.nio.file.Files.isWritable(shm),
      "needs a writable /dev/shm tmpfs mount to force EXDEV")
    val stagedDir = java.nio.file.Files.createTempDirectory(
      shm, "graft-health").toString
    val targetDir = tmpDir("graft-health-target")
    assume(java.nio.file.Files.getFileStore(
        java.nio.file.Paths.get(stagedDir)) !=
      java.nio.file.Files.getFileStore(
        java.nio.file.Paths.get(targetDir)),
      "staged and target dirs must sit on different mounts for EXDEV")
    val f = new Path(targetDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val staged = new Path(stagedDir, "claim.staged")
    val out = f.create(staged, true)
    try out.write("x".getBytes("UTF-8")) finally out.close()
    val target = new Path(targetDir, "claim")
    assert(SwapProtocol.publishIfAbsent(f, staged, target),
      "publish through the fallback should still land")
    assert(f.exists(target) && !f.exists(staged),
      "staged file must be consumed either way")
    assert(SwapProtocol.nonAtomicPublishes.get() > before)

    // extension-parser path
    val viaExt = healthMap(sqlSpark, "SHOW ENGINE HEALTH")
    assert(viaExt("swap.non_atomic_publishes").toLong > before)
    assert(viaExt.contains("bench.fence_disabled"))
    assert(viaExt("epoch_pin.cache_entries").toInt >= 0)
    assert(viaExt("graph.default_wedge_degree_cap") === "8192")
    // statement-runner path (no extensions)
    val viaRun = graft.sql.GraftSql.sql(spark, "SHOW ENGINE HEALTH")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaRun("swap.non_atomic_publishes") ===
      viaExt("swap.non_atomic_publishes"))
  }

  test("SHOW ENGINE HEALTH FOR <table> reports the table's epoch-pinned " +
      "versions") {
    import sqlSpark.implicits._
    val cat = new Catalog(sqlSpark, tmpDir("graft-health-pins"))
    cat.create(Seq((1L, "a")).toDF("id", "v"), "gold", "t_health_pins")
    cat.overwriteSnapshot(Seq((2L, "b")).toDF("id", "v"), "gold",
      "t_health_pins")
    PipelineEpoch.commit(sqlSpark, cat, "p", Seq("gold.t_health_pins"))
    cat.register("gold", "t_health_pins")
    val m = healthMap(sqlSpark, "SHOW ENGINE HEALTH FOR gold.t_health_pins")
    assert(m("epoch_pin.pinned_count") === "1")
    assert(m("epoch_pin.pinned_versions") === "2")
  }
}
