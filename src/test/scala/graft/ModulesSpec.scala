package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.merge.SurrogateKeys
import graft.quality.Expectations

class ExpectationsSpec extends SparkSuite {
  import spark.implicits._

  private def df = Seq((1, 10.0), (2, -1.0), (3, 0.0), (4, 5.0))
    .toDF("id", "price")

  test("applyOrDrop keeps only rows satisfying every rule") {
    val r = Expectations.applyOrDrop(df,
      Map("pos" -> "price > 0", "small" -> "price < 6"))
    assert(r.kept.select("id").as[Int].collect().sorted.toSeq == Seq(4))
  }

  test("violation counts are per-rule and one-pass") {
    val r = Expectations.applyOrDrop(df,
      Map("pos" -> "price > 0", "small" -> "price < 6"))
    assert(r.violations == Map("pos" -> 2L, "small" -> 1L))
  }

  test("applyOrQuarantine splits clean/violating and names the failed rules") {
    val (clean, bad) = Expectations.applyOrQuarantine(df,
      Map("pos" -> "price > 0", "small" -> "price < 6"))
    assert(clean.select("id").as[Int].collect().sorted.toSeq == Seq(4))
    val q = bad.select("id", "_violated_rules").collect()
      .map(r => r.getInt(0) -> r.getSeq[String](1).sorted.toList).toMap
    assert(q == Map(
      1 -> List("small"),      // price 10.0 fails only price < 6
      2 -> List("pos"),        // -1.0 fails only price > 0
      3 -> List("pos")))       // 0.0 fails only price > 0
    // clean + quarantined partition the input exactly
    assert(clean.count() + bad.count() == df.count())
  }

  test("applyOrFail throws when violated, passes through when clean") {
    intercept[IllegalStateException] {
      Expectations.applyOrFail(df, Map("pos" -> "price > 0"))
    }
    assert(Expectations.applyOrFail(df, Map("has_id" -> "id IS NOT NULL"))
      .count() == 4)
  }
}

class SurrogateKeysSpec extends SparkSuite {
  import spark.implicits._

  test("assign: dense, gap-free, deterministic keys continuing from start") {
    val df = Seq(30L, 10L, 20L, 40L).toDF("k")
    val out = SurrogateKeys.assign(df, "skey", Seq("k"), start = 100L)
    val got = out.orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("skey"))).toSeq
    assert(got == Seq((10L, 101L), (20L, 102L), (30L, 103L), (40L, 104L)))
    // deterministic across re-computation
    val again = SurrogateKeys.assign(df, "skey", Seq("k"), start = 100L)
    assert(rowsOf(again, "k") == rowsOf(out, "k"))
  }

  test("assignSmallBatch matches assign on the same input") {
    val df = Seq(3L, 1L, 2L).toDF("k")
    assert(rowsOf(SurrogateKeys.assign(df, "s", Seq("k")), "k") ==
           rowsOf(SurrogateKeys.assignSmallBatch(df, "s", Seq("k")), "k"))
  }
}

class CatalogSpec extends SparkSuite {
  import spark.implicits._

  test("snapshot overwrite swaps atomically and keeps the previous version") {
    val cat = new Catalog(spark, tmpDir("graft-wh"))
    val v1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val v2 = Seq((1, "a"), (2, "B"), (3, "c")).toDF("id", "v")
    cat.overwriteSnapshot(v1, "silver", "t")
    assert(cat.read("silver", "t").count() == 2)
    cat.overwriteSnapshot(v2, "silver", "t")
    assert(cat.read("silver", "t").count() == 3)
    assert(cat.hasPrevious("silver", "t"))
    assert(cat.readPrevious("silver", "t").count() == 2)
  }

  test("time travel: three overwrites, each version readable; pointer survives a crashed swap") {
    val cat = new Catalog(spark, tmpDir("graft-wh-tt"))
    (1 to 3).foreach { v =>
      cat.overwriteSnapshot((1 to v).map(i => (i, s"v$v")).toDF("id", "v"),
        "gold", "tt")
    }
    assert(cat.currentVersion("gold", "tt") == 3)
    assert(cat.listVersions("gold", "tt") == Seq(1, 2, 3))
    (1 to 3).foreach { v =>
      val got = cat.readVersion("gold", "tt", v)
      assert(got.count() == v, s"version $v wrong row count")
      assert(got.select("v").distinct().collect()(0).getString(0) == s"v$v")
    }
    // crash-abort: the NEXT retire target is blocked by a junk file → the
    // swap must abort, the pointer must still name version 3, and every
    // logged version must stay readable
    val block = new org.apache.hadoop.fs.Path(
      cat.path("gold", "tt") + ".history/v00003")
    val fs = block.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(block, true)
    val out = fs.create(block, true); out.write(1); out.close() // a FILE, not a dir
    intercept[IllegalStateException] {
      cat.overwriteSnapshot(Seq((9, "v4")).toDF("id", "v"), "gold", "tt")
    }
    assert(cat.currentVersion("gold", "tt") == 3,
      "crashed swap moved the version pointer")
    assert(cat.read("gold", "tt").count() == 3, "live snapshot lost")
    assert(cat.readVersion("gold", "tt", 2).count() == 2)
  }

  test("history lists every readable version with commit time and footprint") {
    val cat = new Catalog(spark, tmpDir("graft-wh-hist"))
    (1 to 3).foreach { v =>
      cat.overwriteSnapshot((1 to v).map(i => (i, s"v$v")).toDF("id", "v"),
        "gold", "hist")
    }
    val h = cat.history("gold", "hist").collect()
    assert(h.length == 3)
    assert(h(0).getAs[Int]("version") == 3 && h(0).getAs[Boolean]("is_current"))
    assert(h.count(_.getAs[Boolean]("is_current")) == 1)
    assert(h.forall(_.getAs[Long]("size_bytes") > 0))
    assert(h.forall(r => r.getAs[java.sql.Timestamp]("snapshot_time") != null))
  }

  test("history records the operation that committed each version") {
    val cat = new Catalog(spark, tmpDir("graft-wh-ops"))
    cat.overwriteSnapshot(Seq((1, "a"), (2, "b")).toDF("id", "v"),
      "gold", "ops") // v1 WRITE
    cat.append(Seq((3, "c")).toDF("id", "v"), "gold", "ops") // v2 APPEND
    cat.compact("gold", "ops", targetFileSize = 1L << 20) // v3 OPTIMIZE
    cat.restore("gold", "ops", 1) // v4 RESTORE
    val ops = cat.history("gold", "ops").orderBy("version").collect()
      .map(_.getAs[String]("operation")).toSeq
    assert(ops == Seq("WRITE", "APPEND", "OPTIMIZE", "RESTORE"), s"got $ops")
  }

  test("time travel by timestamp: newest version at or before ts; pre-history raises") {
    val cat = new Catalog(spark, tmpDir("graft-wh-tstt"))
    // sleeps straddle each commit so the captured instants land strictly
    // BETWEEN version commit times (local-FS mtimes are millisecond-grained)
    val between = scala.collection.mutable.ArrayBuffer.empty[java.sql.Timestamp]
    (1 to 3).foreach { v =>
      cat.overwriteSnapshot((1 to v).map(i => (i, s"v$v")).toDF("id", "v"),
        "gold", "tst")
      Thread.sleep(120)
      between += new java.sql.Timestamp(System.currentTimeMillis())
      Thread.sleep(20)
    }
    // an instant between commit(v) and commit(v+1) reads version v
    assert(cat.readTimestamp("gold", "tst", between(0)).count() == 1)
    assert(cat.readTimestamp("gold", "tst", between(1)).count() == 2)
    // at or past the latest commit: the live snapshot
    assert(cat.readTimestamp("gold", "tst", between(2)).count() == 3)
    // a version's exact commit time reads that version (<= is inclusive)
    val commits = cat.history("gold", "tst").collect()
      .map(r => r.getAs[Int]("version") ->
        r.getAs[java.sql.Timestamp]("snapshot_time")).toMap
    assert(cat.readTimestamp("gold", "tst", commits(2)).count() == 2)
    // before the earliest retained commit: no reconstructible state
    val ex = intercept[IllegalArgumentException] {
      cat.readTimestamp("gold", "tst",
        new java.sql.Timestamp(commits(1).getTime - 60000))
    }
    assert(ex.getMessage.contains("before the earliest"))
  }

  test("time travel: versions beyond the retention window are pruned") {
    val cat = new Catalog(spark, tmpDir("graft-wh-ret"), keepVersions = 2)
    (1 to 4).foreach { v =>
      cat.overwriteSnapshot((1 to v).map(i => (i, s"v$v")).toDF("id", "v"),
        "gold", "ret")
    }
    assert(cat.currentVersion("gold", "ret") == 4)
    assert(cat.listVersions("gold", "ret") == Seq(2, 3, 4))
    assert(cat.readVersion("gold", "ret", 2).count() == 2)
    intercept[IllegalArgumentException] {
      cat.readVersion("gold", "ret", 1)
    }
  }

  test("legacy single-depth .prev layout stays readable; vacuum reclaims it once a log exists") {
    val cat = new Catalog(spark, tmpDir("graft-wh-legacy"))
    // simulate a warehouse written by the pre-version-log engine: a live
    // snapshot + a bare .prev dir, no history
    Seq((1, "new"), (2, "new")).toDF("id", "v")
      .write.parquet(cat.path("silver", "legacy"))
    Seq((1, "old")).toDF("id", "v")
      .write.parquet(cat.path("silver", "legacy") + ".prev")
    assert(cat.hasPrevious("silver", "legacy"))
    assert(cat.readPrevious("silver", "legacy").count() == 1)
    // no version log yet → vacuum must NOT delete the only previous copy
    cat.vacuum("silver", "legacy")
    assert(cat.hasPrevious("silver", "legacy"))
    // a new-protocol overwrite starts the log; .prev is then superseded
    cat.overwriteSnapshot(Seq((1, "newer")).toDF("id", "v"), "silver", "legacy")
    assert(cat.readPrevious("silver", "legacy").count() == 2) // from the log
    val deleted = cat.vacuum("silver", "legacy")
    assert(deleted.exists(_.endsWith(".prev")), "superseded .prev not reclaimed")
    assert(cat.hasPrevious("silver", "legacy")) // the log still serves v1
  }

  test("compact packs the snapshot into fewer files as a new version; vacuum reclaims it after a retention cut") {
    val cat = new Catalog(spark, tmpDir("graft-wh-compact"))
    val df = (1 to 5000).map(i => (i, s"v$i")).toDF("id", "v")
    cat.overwriteSnapshot(df.repartition(32), "gold", "cmp")
    val base = cat.path("gold", "cmp")
    def dataFiles: Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(base)).count(_.getName.endsWith(".parquet"))
    }
    val before = dataFiles
    assert(before > 1, "fixture must start fragmented")
    val rowsBefore = rowsOf(cat.read("gold", "cmp"), "id")
    cat.compact("gold", "cmp", 512L * 1024 * 1024)
    // fewer files, identical contents, history gained a version
    assert(dataFiles == 1, s"expected one packed file, found $dataFiles")
    assert(rowsOf(cat.read("gold", "cmp"), "id") == rowsBefore)
    assert(cat.currentVersion("gold", "cmp") == 2)
    assert(cat.listVersions("gold", "cmp") == Seq(1, 2))
    assert(rowsOf(cat.readVersion("gold", "cmp", 1), "id") == rowsBefore)
    // already packed → no pointless version churn
    cat.compact("gold", "cmp", 512L * 1024 * 1024)
    assert(cat.currentVersion("gold", "cmp") == 2)
    // retention lowered afterwards: vacuum reclaims the pre-compact version
    val narrowed = new Catalog(spark, cat.path("gold", "cmp")
      .stripSuffix("/gold/cmp"), keepVersions = 0)
    val deleted = narrowed.vacuum("gold", "cmp")
    assert(deleted.exists(_.endsWith("v00001")), s"v1 not reclaimed: $deleted")
    intercept[IllegalArgumentException] { cat.readVersion("gold", "cmp", 1) }
    assert(rowsOf(cat.read("gold", "cmp"), "id") == rowsBefore) // live intact
  }

  test("vacuum removes staging leftovers and out-of-window versions, keeps live + retained") {
    val cat = new Catalog(spark, tmpDir("graft-wh-vac"), keepVersions = 1)
    (1 to 3).foreach { v =>
      cat.overwriteSnapshot((1 to v).map(i => (i, s"v$v")).toDF("id", "v"),
        "gold", "vac")
    }
    val base = cat.path("gold", "vac")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // plant crash leftovers: a staging dir, a bucket .prev- dir, and a
    // version-log entry beyond the retention window
    fs.mkdirs(new org.apache.hadoop.fs.Path(base + ".tmp"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$base/.prev-gbucket=1"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(base + ".history/v00001"))
    val deleted = cat.vacuum("gold", "vac")
    assert(deleted.exists(_.endsWith(".tmp")))
    assert(deleted.exists(_.contains(".prev-gbucket=1")))
    assert(deleted.exists(_.endsWith("v00001")))
    // live snapshot + retained version untouched
    assert(cat.read("gold", "vac").count() == 3)
    assert(cat.currentVersion("gold", "vac") == 3)
    assert(cat.readVersion("gold", "vac", 2).count() == 2)
  }

  test("registered tables serve the NEW snapshot after an overwrite (relation cache refreshed)") {
    val cat = new Catalog(spark, tmpDir("graft-wh3"))
    cat.overwriteSnapshot(Seq((1, "x")).toDF("id", "v"), "gold", "dim_rf")
    cat.register("gold", "dim_rf")
    // populate the relation cache with the v1 file list
    assert(spark.table("gold.dim_rf").count() == 1L)
    cat.overwriteSnapshot(Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v"),
      "gold", "dim_rf")
    // without refreshByPath this read either fails (deleted files) or
    // silently serves the retired snapshot
    assert(spark.table("gold.dim_rf").count() == 3L)
    cat.dropRegistration("gold", "dim_rf")
  }

  test("register + tableExists + SQL addressing (S8/S9/S11/S12)") {
    val cat = new Catalog(spark, tmpDir("graft-wh2"))
    cat.overwriteSnapshot(Seq((1, "x")).toDF("id", "v"), "gold", "dim")
    assert(!cat.tableExists("gold", "dim"))
    cat.register("gold", "dim")
    assert(cat.tableExists("gold", "dim"))
    assert(spark.sql("SELECT count(*) c FROM gold.dim").collect()(0).getLong(0) == 1L)
    cat.dropRegistration("gold", "dim")
    assert(!cat.tableExists("gold", "dim"))
  }

  test("auto-compaction: opt-in post-commit OPTIMIZE when small files pile up") {
    import spark.implicits._
    val cat = new graft.catalog.Catalog(spark, tmpDir("graft-autocompact"))
    def nFiles = new java.io.File(cat.path("silver", "ac")).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    cat.create(Seq((1L, "a")).toDF("id", "v"), "silver", "ac")
    // off by default: appends accumulate files freely
    (2 to 5).foreach(i => cat.append(Seq((i.toLong, s"v$i")).toDF("id", "v"),
      "silver", "ac"))
    assert(nFiles >= 5, s"expected accumulated small files, got $nFiles")
    spark.conf.set("graft.autoCompact.minFiles", "3")
    try {
      cat.append(Seq((6L, "f")).toDF("id", "v"), "silver", "ac")
      assert(nFiles <= 3, s"auto-compact did not pack, files=$nFiles")
      // contents intact, and the compaction is its own OPTIMIZE version
      assert(rowsOf(cat.read("silver", "ac"), "id").map(_.head) ==
        (1L to 6L))
      val ops = cat.history("silver", "ac").select("operation")
        .collect().map(_.getString(0)).toSeq
      assert(ops.head == "OPTIMIZE" && ops(1) == "APPEND",
        s"history must show append then auto-OPTIMIZE, got $ops")
      // a clean table does not re-compact
      val v = cat.currentVersion("silver", "ac")
      cat.overwriteSnapshot(cat.read("silver", "ac").repartition(1),
        "silver", "ac")
      assert(cat.currentVersion("silver", "ac") == v + 1,
        "packed write must not trigger a follow-up compaction")
    } finally spark.conf.unset("graft.autoCompact.minFiles")
  }
}
