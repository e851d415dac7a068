package graft

import org.apache.spark.sql.functions._

import graft.layout.DeletionVectors

/** Merge-on-read deletion vectors: position-sidecar DELETE/UPDATE that
  * never rewrites data files, DV-applied reads everywhere (catalog API,
  * time travel, CDF, transparent rule), and materialization via
  * OPTIMIZE/REORG. */
class DvSpec extends SparkSuite {
  import spark.implicits._

  private def freshCat() = {
    val wh = tmpDir("graft-dv")
    (new graft.catalog.Catalog(spark, wh), wh)
  }

  /** (name -> unix fileKey) for every top-level data file — the inode
    * identity that proves a "write" never touched the bytes. */
  private def dataFileKeys(dir: String): Map[String, Object] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).map { f =>
      f.getName -> java.nio.file.Files.readAttributes(f.toPath,
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
    }.toMap
  }

  test("DV delete: rows subtracted, data files untouched, versioned") {
    val (cat, wh) = freshCat()
    val df = (1L to 100L).map(i => (i, i % 10, s"row$i"))
      .toDF("id", "grp", "payload").repartition(4)
    cat.create(df, "silver", "t")
    val dir = cat.path("silver", "t")
    val before = dataFileKeys(dir)
    assert(before.size == 4)

    cat.enableDeletionVectors("silver", "t")
    val n = cat.deleteWhere("silver", "t", col("grp") === 3)
    assert(n == 10)

    // the exact inodes survived — nothing was rewritten
    val after = dataFileKeys(dir)
    assert(after == before, "DV delete must not touch data files")
    assert(DeletionVectors.dvRowCount(spark, dir) == 10)

    // reads subtract the positions
    assert(cat.read("silver", "t").count() == 90)
    assert(cat.read("silver", "t").filter(col("grp") === 3).count() == 0)
    // and it is a real version: the pre-delete version still has 100
    assert(cat.currentVersion("silver", "t") == 2)
    assert(cat.readVersion("silver", "t", 1).count() == 100)
    assert(cat.readVersion("silver", "t", 2).count() == 90)
  }

  test("deletes accumulate; no-op delete commits no version; NULL cond rows stay") {
    val (cat, _) = freshCat()
    val df = Seq((1L, Some(1)), (2L, Some(2)), (3L, None))
      .toDF("id", "v")
    cat.create(df, "silver", "t2")
    cat.enableDeletionVectors("silver", "t2")
    val dir = cat.path("silver", "t2")

    assert(cat.deleteWhere("silver", "t2", col("v") === 1) == 1)
    val v1 = cat.currentVersion("silver", "t2")
    // same predicate again: already deleted → no match, NO new version
    assert(cat.deleteWhere("silver", "t2", col("v") === 1) == 0)
    assert(cat.currentVersion("silver", "t2") == v1)
    // NULL-evaluating rows are never deleted (3VL, Delta semantics)
    assert(cat.deleteWhere("silver", "t2", col("v") < 10) == 1)
    assert(rowsOf(cat.read("silver", "t2"), "id").map(_.head) == Seq(3L))
    assert(DeletionVectors.dvRowCount(spark, dir) == 2)
  }

  test("DV update: one commit, old files untouched, updated rows appended") {
    val (cat, _) = freshCat()
    cat.create((1L to 50L).map(i => (i, i * 1.0)).toDF("id", "price")
      .repartition(3), "silver", "t3")
    cat.enableDeletionVectors("silver", "t3")
    val dir = cat.path("silver", "t3")
    val before = dataFileKeys(dir)

    val n = cat.updateWhere("silver", "t3", col("id") <= 5,
      Seq("price" -> (col("price") * 2)))
    assert(n == 5)
    val after = dataFileKeys(dir)
    // every pre-update file survived byte-identical; new file(s) appended
    assert(before.forall { case (k, v) => after.get(k).contains(v) },
      "update must not rewrite existing files")
    assert(after.size > before.size, "updated rows land in new files")

    val got = cat.read("silver", "t3")
    assert(got.count() == 50)
    assert(rowsOf(got.filter(col("id") <= 5), "id").map(_(1)) ==
      Seq(2.0, 4.0, 6.0, 8.0, 10.0))
    assert(rowsOf(got.filter(col("id") === 6L)).head(1) == 6.0)
    // ONE commit for the whole update
    assert(cat.currentVersion("silver", "t3") == 2)
  }

  test("materialize + OPTIMIZE fold the sidecar away; RESTORE resurrects") {
    val (cat, _) = freshCat()
    cat.create((1L to 40L).map(i => (i, s"p$i")).toDF("id", "p")
      .repartition(4), "silver", "t4")
    cat.enableDeletionVectors("silver", "t4")
    val dir = cat.path("silver", "t4")
    cat.deleteWhere("silver", "t4", col("id") % 4 === 0)
    assert(DeletionVectors.dvRowCount(spark, dir) == 10)

    val expect = rowsOf(cat.read("silver", "t4"), "id")
    cat.materializeDeletes("silver", "t4")
    assert(!DeletionVectors.hasDv(spark, dir), "sidecar must be gone")
    assert(rowsOf(cat.read("silver", "t4"), "id") == expect)
    assert(cat.currentVersion("silver", "t4") == 3)
    // a second materialize is a no-op (no sidecar, no version)
    cat.materializeDeletes("silver", "t4")
    assert(cat.currentVersion("silver", "t4") == 3)

    // OPTIMIZE also materializes, even when file counts say "packed"
    cat.deleteWhere("silver", "t4", col("id") === 1L)
    assert(DeletionVectors.hasDv(spark, dir))
    cat.compact("silver", "t4", 256L * 1024 * 1024)
    assert(!DeletionVectors.hasDv(spark, dir),
      "OPTIMIZE must purge deletion vectors")
    assert(cat.read("silver", "t4").count() == 29)

    // RESTORE to the pre-delete version resurrects rows (version law)
    cat.restore("silver", "t4", 1)
    assert(cat.read("silver", "t4").count() == 40)
  }

  test("CDF reports DV deletes (no vacuous append-only fast path)") {
    val (cat, _) = freshCat()
    cat.create(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      "silver", "t5")
    cat.enableDeletionVectors("silver", "t5")
    cat.deleteWhere("silver", "t5", col("id") === 2L)
    val ch = cat.changes("silver", "t5", 1, 2, keys = Seq("id"))
    val rows = rowsOf(ch, "id").map(r => (r.head, r.last))
    assert(rows == Seq((2L, "delete")),
      s"expected one delete change row, got $rows")
  }

  test("DV update enforces CHECK constraints on the new rows; abort leaves table intact") {
    val (cat, _) = freshCat()
    cat.create(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"),
      "silver", "t6")
    cat.addConstraint("silver", "t6", "price_pos", "price > 0")
    cat.enableDeletionVectors("silver", "t6")
    val e = intercept[IllegalStateException] {
      cat.updateWhere("silver", "t6", col("id") === 1L,
        Seq("price" -> lit(-5.0)))
    }
    assert(e.getMessage.contains("price_pos"))
    assert(rowsOf(cat.read("silver", "t6"), "id") ==
      Seq(Seq(1L, 10.0), Seq(2L, 20.0)))
    assert(cat.currentVersion("silver", "t6") == 1)
    // a valid update still lands
    assert(cat.updateWhere("silver", "t6", col("id") === 1L,
      Seq("price" -> lit(99.0))) == 1)
    assert(rowsOf(cat.read("silver", "t6"), "id").head == Seq(1L, 99.0))
  }

  test("mode off: eager DELETE on a DV-carrying table materializes, never resurrects") {
    val (cat, _) = freshCat()
    cat.create((1L to 20L).map(i => (i, i % 2)).toDF("id", "par"),
      "silver", "t7")
    cat.enableDeletionVectors("silver", "t7")
    cat.deleteWhere("silver", "t7", col("id") <= 5)   // merge-on-read
    cat.disableDeletionVectors("silver", "t7")
    // copy-on-write path now — its base read must apply the sidecar
    assert(cat.deleteWhere("silver", "t7", col("id") === 10L) == 1)
    val got = rowsOf(cat.read("silver", "t7"), "id").map(_.head)
    assert(got == ((6L to 20L).filterNot(_ == 10L)),
      s"resurrected rows: $got")
  }

  test("INSERT/append carries the sidecar forward") {
    val (cat, _) = freshCat()
    cat.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "silver", "t8")
    cat.enableDeletionVectors("silver", "t8")
    cat.deleteWhere("silver", "t8", col("id") === 1L)
    cat.append(Seq((3L, "c")).toDF("id", "v"), "silver", "t8")
    assert(rowsOf(cat.read("silver", "t8"), "id").map(_.head) ==
      Seq(2L, 3L))
  }

  test("SQL surface: TBLPROPERTIES flip, merge-on-read DML, transparent reads, DESCRIBE DETAIL") {
    // extension session (MergeSqlSpec's pattern)
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-dv-sql-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    try {
      val dir = tmpDir("dv-sql") + "/t"
      import s.implicits._
      (1L to 30L).map(i => (i, i % 3, s"v$i")).toDF("id", "m", "v")
        .repartition(2).write.parquet(dir)
      s.sql(s"CREATE TABLE dvt USING parquet LOCATION '$dir'")
      s.sql("ALTER TABLE dvt SET TBLPROPERTIES " +
        "('graft.enableDeletionVectors' = 'true')")
      assert(DeletionVectors.isEnabled(s, dir))

      val before = dataFileKeys(dir)
      val del = s.sql("DELETE FROM dvt WHERE m = 0").collect()
      assert(del.head.getLong(0) == 10)
      assert(dataFileKeys(dir) == before, "SQL DELETE rewrote data files")

      // ORDINARY reads see the deletion via DvApplyRule
      assert(s.sql("SELECT count(*) c FROM dvt").collect().head.getLong(0)
        == 20)
      assert(s.table("dvt").count() == 20)
      // filters still compose
      assert(s.sql("SELECT count(*) c FROM dvt WHERE m = 0")
        .collect().head.getLong(0) == 0)

      val upd = s.sql("UPDATE dvt SET v = 'X' WHERE id = 2").collect()
      assert(upd.head.getLong(0) == 1)
      assert(s.sql("SELECT v FROM dvt WHERE id = 2")
        .collect().head.getString(0) == "X")

      val detail = s.sql("DESCRIBE DETAIL dvt").collect().head
      assert(detail.getAs[Long]("num_dv_positions") == 11)

      // OPTIMIZE purges; reads unchanged
      s.sql("OPTIMIZE dvt")
      assert(!DeletionVectors.hasDv(s, dir))
      assert(s.table("dvt").count() == 20)
      assert(s.sql("DESCRIBE DETAIL dvt").collect().head
        .getAs[Long]("num_dv_positions") == 0)

      // flipping off returns to copy-on-write
      s.sql("ALTER TABLE dvt SET TBLPROPERTIES " +
        "('graft.enableDeletionVectors' = 'false')")
      assert(!DeletionVectors.isEnabled(s, dir))
      s.sql("DELETE FROM dvt WHERE id = 4") // id=3 went with the m=0 pass
      assert(s.table("dvt").count() == 19)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("REORG TABLE ... APPLY (PURGE) folds the sidecar; no-op without one") {
    val (cat, _) = freshCat()
    cat.create((1L to 12L).map(i => (i, s"r$i")).toDF("id", "v"),
      "silver", "t10")
    cat.register("silver", "t10")
    try {
      val dir = cat.path("silver", "t10")
      cat.enableDeletionVectors("silver", "t10")
      cat.deleteWhere("silver", "t10", col("id") > 10L)
      assert(DeletionVectors.hasDv(spark, dir))
      val expect = rowsOf(cat.read("silver", "t10"), "id")
      graft.sql.GraftSql.sql(spark, "REORG TABLE silver.t10 APPLY (PURGE)")
      assert(!DeletionVectors.hasDv(spark, dir))
      assert(rowsOf(cat.read("silver", "t10"), "id") == expect)
      val v = cat.currentVersion("silver", "t10")
      // purging a clean table commits nothing
      graft.sql.GraftSql.sql(spark, "REORG TABLE silver.t10 APPLY (PURGE)")
      assert(cat.currentVersion("silver", "t10") == v)
    } finally cat.dropRegistration("silver", "t10")
  }

  test("clones carry the sidecar (deletions survive); mode flag does not transfer") {
    val (cat, _) = freshCat()
    cat.create((1L to 10L).map(i => (i, s"c$i")).toDF("id", "v"),
      "silver", "t11")
    cat.enableDeletionVectors("silver", "t11")
    cat.deleteWhere("silver", "t11", col("id") > 8L)
    cat.clone("silver", "t11", "silver", "t11_deep")
    cat.shallowClone("silver", "t11", "silver", "t11_shallow")
    for (t <- Seq("t11_deep", "t11_shallow")) {
      assert(cat.read("silver", t).count() == 8,
        s"$t resurrected DV-deleted rows")
      // the clone reads its own copied sidecar, not the source's
      assert(DeletionVectors.hasDv(spark, cat.path("silver", t)))
      // the merge-on-read MODE is per-table config and starts default
      assert(!DeletionVectors.isEnabled(spark, cat.path("silver", t)))
    }
  }

  test("streaming batch markers survive OPTIMIZE, materialize, and DV DML") {
    // the exactly-once marker means "batch <= N landed here"; a layout
    // rewrite or later row-level change must not erase it, or a crash
    // replay inside the append->marker-record window double-appends
    val (cat, _) = freshCat()
    cat.create(Seq((1L, "a")).toDF("id", "v"), "silver", "t12")
    val dir = cat.path("silver", "t12")
    graft.catalog.Catalog.appendPath(spark,
      Seq((2L, "b"), (3L, "c")).toDF("id", "v"), dir,
      commitTag = Some(("stream_batch", "7")))
    def marker = graft.catalog.Catalog
      .lastCommitTag(spark, dir, "stream_batch")
    assert(marker.contains("7"))
    cat.compact("silver", "t12", 1L) // force a pack (tiny target)
    assert(marker.contains("7"), "OPTIMIZE erased the batch marker")
    cat.enableDeletionVectors("silver", "t12")
    cat.deleteWhere("silver", "t12", col("id") === 1L)
    assert(marker.contains("7"), "DV delete erased the batch marker")
    cat.materializeDeletes("silver", "t12")
    assert(marker.contains("7"), "materialize erased the batch marker")
    // untagged commits of every kind carry the marker too
    cat.append(Seq((9L, "z")).toDF("id", "v"), "silver", "t12")
    assert(marker.contains("7"), "plain append erased the batch marker")
    cat.overwriteSnapshot(cat.read("silver", "t12"), "silver", "t12")
    assert(marker.contains("7"), "overwrite erased the batch marker")
    cat.restore("silver", "t12",
      cat.currentVersion("silver", "t12") - 1)
    assert(marker.contains("7"), "RESTORE erased the batch marker")
    // a LATER tagged commit still wins (tags are last-writer)
    graft.catalog.Catalog.appendPath(spark,
      Seq((4L, "d")).toDF("id", "v"), dir,
      commitTag = Some(("stream_batch", "8")))
    assert(marker.contains("8"))
  }

  test("skipping pruning and DV application compose on one scan") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-dv-skip-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    try {
      val dir = tmpDir("dv-skip") + "/t"
      import s.implicits._
      s.range(4000L).toDF("id")
        .withColumn("v", col("id") % 100)
        .repartitionByRange(8, col("id"))
        .sortWithinPartitions("id")
        .write.parquet(dir)
      graft.layout.DataSkipping.analyze(s, dir, Seq("id"))
      s.sql(s"CREATE TABLE dvskip USING parquet LOCATION '$dir'")
      s.sql("ALTER TABLE dvskip SET TBLPROPERTIES " +
        "('graft.enableDeletionVectors' = 'true')")
      s.sql("DELETE FROM dvskip WHERE v = 7")
      // the DELETE staged links — the skipping manifest survives and the
      // per-file ranges are still valid, so a range filter must BOTH
      // prune files (skipping rule) AND subtract positions (DV rule)
      val q = s.sql("SELECT id, v FROM dvskip WHERE id >= 100 AND id <= 400")
      val p = q.queryExecution.executedPlan.toString
      // the DV rewrite carries the skipping-pruned FILE LIST into its
      // marker index (the class name in the plan is the DV marker; the
      // pruning survives as the eliminated files)
      assert(p.contains("GraftDvFileIndex"),
        s"DV rule did not rewrite the pruned scan:\n$p")
      assert(q.inputFiles.length < 8,
        s"skipping pruning lost under DV: ${q.inputFiles.length} files")
      val expect = graft.layout.DeletionVectors.readPath(s, dir)
        .filter(col("id") >= 100 && col("id") <= 400).select("id", "v")
      assert(rowsOf(q, "id") == rowsOf(expect, "id"),
        "composed read diverged from the explicit DV-applied filter")
      assert(q.filter(col("v") === 7).count() == 0)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("plain-session GraftSql: DV DML + reads agree without the rule") {
    val (cat, _) = freshCat()
    cat.create((1L to 10L).map(i => (i, s"r$i")).toDF("id", "v"),
      "silver", "t9")
    cat.register("silver", "t9")
    try {
      val dir = cat.path("silver", "t9")
      graft.sql.GraftSql.sql(spark, "ALTER TABLE silver.t9 SET " +
        "TBLPROPERTIES ('graft.enableDeletionVectors' = 'true')")
      graft.sql.GraftSql.sql(spark, "DELETE FROM silver.t9 WHERE id <= 4")
      assert(DeletionVectors.hasDv(spark, dir))
      // catalog reads apply; MERGE over the DV table must not resurrect
      assert(cat.read("silver", "t9").count() == 6)
      graft.sql.GraftSql.sql(spark,
        """MERGE INTO silver.t9 t USING (SELECT 5 AS id, 'M' AS v) s
           ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET v = s.v""")
      val got = rowsOf(cat.read("silver", "t9"), "id")
      assert(got.map(_.head) == (5L to 10L))
      assert(got.head == Seq(5L, "M"))
      // the merge write-back staged fresh files → sidecar retired
      assert(!DeletionVectors.hasDv(spark, dir))
    } finally {
      cat.dropRegistration("silver", "t9")
    }
  }
}
