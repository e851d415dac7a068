package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomAgg
import graft.layout.DataSkipping
import graft.layout.DataSkipping.{EqVal, InVals, Range}

class DataSkippingSpec extends SparkSuite {
  import spark.implicits._

  private def writeRangeLayout(dir: String, n: Int = 4000, files: Int = 8)
      : Unit =
    spark.range(n.toLong).toDF("id")
      .withColumn("grp", (col("id") % 5).cast("string"))
      .withColumn("key", concat(lit("k"), col("id")))
      .repartitionByRange(files, col("id"))
      .sortWithinPartitions("id")
      .write.parquet(dir)

  test("range predicate prunes files; results equal the unpruned filter") {
    val dir = tmpDir("skip-range") + "/t"
    writeRangeLayout(dir)
    val nFiles = DataSkipping.analyze(spark, dir, Seq("id"))
    assert(nFiles == 8)

    val preds = Seq(Range("id", Some(100L), Some(220L)))
    val (kept, total) = DataSkipping.prunedFiles(spark, dir, preds)
    assert(total == 8)
    assert(kept.size <= 2, s"range spanning ~1/8 of keyspace kept $kept")

    val pruned = DataSkipping.read(spark, dir, preds)
    // the scan really only opens the surviving files
    assert(pruned.inputFiles.length == kept.size)
    val full = spark.read.parquet(dir)
      .where(col("id") >= 100L && col("id") <= 220L)
    assert(rowsOf(pruned, "id") == rowsOf(full, "id"))
  }

  test("bloom filter prunes equality lookups min/max cannot") {
    val dir = tmpDir("skip-bloom") + "/t"
    // hash layout: every file's [min,max] spans the whole keyspace, so
    // only the per-file bloom can rule files out for an exact key
    spark.range(4000L).toDF("id")
      .withColumn("key", concat(lit("k"), col("id")))
      .repartition(8, col("key"))
      .write.parquet(dir)
    DataSkipping.analyze(spark, dir, Seq("id"), bloomCols = Seq("key"))

    val (keptRange, _) =
      DataSkipping.prunedFiles(spark, dir, Seq(Range("id", Some(77L), Some(77L))))
    assert(keptRange.size == 8, "hash layout must defeat min/max pruning")

    val (kept, total) = DataSkipping.prunedFiles(spark, dir,
      Seq(EqVal("key", "k77")))
    assert(total == 8)
    assert(kept.size < 8, "bloom should rule out most files for one key")
    val pruned = DataSkipping.read(spark, dir, Seq(EqVal("key", "k77")))
    assert(rowsOf(pruned).map(_.head) == Seq(77L))

    // IN over several keys: union of the per-key survivors, still pruned
    val vals = Seq("k5", "k1234", "k3999")
    val (keptIn, _) = DataSkipping.prunedFiles(spark, dir,
      Seq(InVals("key", vals)))
    assert(keptIn.size < 8)
    assert(rowsOf(DataSkipping.read(spark, dir, Seq(InVals("key", vals))))
      .map(_.head).toSet == Set(5L, 1234L, 3999L))
  }

  test("absent key: bloom prunes everything, read returns empty with schema") {
    val dir = tmpDir("skip-absent") + "/t"
    spark.range(1000L).toDF("id")
      .withColumn("key", concat(lit("k"), col("id")))
      .repartition(4, col("key")).write.parquet(dir)
    DataSkipping.analyze(spark, dir, Seq("id"), bloomCols = Seq("key"))
    val out = DataSkipping.read(spark, dir, Seq(EqVal("key", "nope")))
    assert(out.columns.toSeq == Seq("id", "key"))
    assert(out.count() == 0)
    // out-of-range scan prunes every file driver-side too
    val (kept, _) = DataSkipping.prunedFiles(spark, dir,
      Seq(Range("id", Some(5000L), None)))
    assert(kept.isEmpty)
  }

  test("files appended after ANALYZE are always read (stale stats safe)") {
    val dir = tmpDir("skip-stale") + "/t"
    writeRangeLayout(dir, n = 800, files = 4)
    DataSkipping.analyze(spark, dir, Seq("id"))
    // a late append lands rows OUTSIDE every profiled file's range
    spark.range(10000L, 10010L).toDF("id")
      .withColumn("grp", lit("9")).withColumn("key", lit("late"))
      .coalesce(1).write.mode("append").parquet(dir)
    val out = DataSkipping.read(spark, dir,
      Seq(Range("id", Some(10000L), None)))
    assert(out.count() == 10, "unprofiled files must never be pruned")
  }

  test("all-null stats prune; null rows never match range predicates") {
    val dir = tmpDir("skip-null") + "/t"
    val withNulls = spark.range(100L).toDF("id")
      .withColumn("v", when(col("id") < 50, col("id")))
    withNulls.where(col("v").isNull).coalesce(1).write.parquet(dir)
    withNulls.where(col("v").isNotNull).coalesce(1)
      .write.mode("append").parquet(dir)
    DataSkipping.analyze(spark, dir, Seq("v"))
    val preds = Seq(Range("v", Some(10L), Some(20L)))
    val (kept, total) = DataSkipping.prunedFiles(spark, dir, preds)
    assert(total == 2 && kept.size == 1, "the all-null file must prune")
    assert(DataSkipping.read(spark, dir, preds).count() == 11)
  }

  test("timestamp + string stats: q86 shape matches the plain filter") {
    val dir = tmpDir("skip-ts") + "/t"
    Tables.load(spark, sf0001, "orders")
      .repartitionByRange(8, col("o_orderdate"))
      .sortWithinPartitions("o_orderdate")
      .write.parquet(dir)
    DataSkipping.analyze(spark, dir, Seq("o_orderdate", "o_orderstatus"))
    val lo = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1995-03-31 23:59:59.999")
    val preds = Seq(Range("o_orderdate", Some(lo), Some(hi)))
    val (kept, total) = DataSkipping.prunedFiles(spark, dir, preds)
    assert(total == 8 && kept.size < 8,
      s"a quarter of a 7-year range must prune most of 8 files, kept $kept")
    val pruned = DataSkipping.read(spark, dir, preds)
    val full = spark.read.parquet(dir)
      .where(col("o_orderdate") >= lo && col("o_orderdate") <= hi)
    assert(pruned.count() == full.count() && pruned.count() > 0)
  }

  test("hive-partitioned layout keeps partition columns through pruning") {
    val dir = tmpDir("skip-part") + "/t"
    spark.range(1000L).toDF("id")
      .withColumn("grp", (col("id") % 4).cast("string"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.partitionBy("grp").parquet(dir)
    DataSkipping.analyze(spark, dir, Seq("id"))
    val out = DataSkipping.read(spark, dir, Seq(Range("id", Some(0L), Some(99L))))
    assert(out.columns.contains("grp"))
    assert(out.count() == 100)
    assert(out.inputFiles.length < spark.read.parquet(dir).inputFiles.length)
  }

  test("catalog wrappers analyze and read through layer.table names") {
    val wh = tmpDir("skip-cat")
    val cat = new graft.catalog.Catalog(spark, wh)
    cat.create(spark.range(500L).toDF("id")
      .repartitionByRange(5, col("id")).sortWithinPartitions("id"),
      "silver", "ids")
    assert(cat.analyzeSkipping("silver", "ids", Seq("id")) == 5)
    val out = cat.readSkipping("silver", "ids",
      Seq(Range("id", Some(0L), Some(99L))))
    assert(out.count() == 100)
    assert(out.inputFiles.length < 5)
  }

  test("OPTIMIZE refreshes skipping stats with the recorded recipe") {
    val wh = tmpDir("skip-opt")
    val cat = new graft.catalog.Catalog(spark, wh)
    cat.create(spark.range(2000L).toDF("id")
      .withColumn("key", concat(lit("k"), col("id")))
      .repartitionByRange(8, col("id")).sortWithinPartitions("id"),
      "silver", "t")
    cat.analyzeSkipping("silver", "t", Seq("id"), bloomCols = Seq("key"))
    val dir = cat.path("silver", "t")
    assert(DataSkipping.analyzedColumns(spark, dir)
      .map { case (c, b, _, _) => (c, b) } == Some((Seq("id", "key"), Seq("key"))))
    // compaction rewrites every file; the recipe must be replayed so the
    // NEW files prune (stale entries would merely stop pruning)
    cat.compact("silver", "t", targetFileSize = 1L << 30)
    val (kept, total) = DataSkipping.prunedFiles(spark, dir,
      Seq(Range("id", Some(0L), Some(10L))))
    assert(total == 1 && kept.size == 1) // packed into one file
    // manifest names must match the REWRITTEN listing, not the retired one
    val (keptAbsent, _) = DataSkipping.prunedFiles(spark, dir,
      Seq(Range("id", Some(99999L), None)))
    assert(keptAbsent.isEmpty,
      "stats must describe the new files (stale names would never prune)")
  }

  test("ANALYZE TABLE ... COMPUTE SKIPPING STATISTICS SQL statement") {
    val wh = tmpDir("skip-sql")
    val cat = new graft.catalog.Catalog(spark, wh)
    cat.create(spark.range(1000L).toDF("id")
      .withColumn("key", concat(lit("b"), col("id")))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      "silver", "ts")
    cat.register("silver", "ts")
    val out = graft.sql.GraftSql.sql(spark,
      "ANALYZE TABLE silver.ts COMPUTE SKIPPING STATISTICS " +
        "FOR COLUMNS (id) BLOOM (key)").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(4))
    val dir = cat.path("silver", "ts")
    assert(DataSkipping.analyzedColumns(spark, dir)
      .map(_._2) == Some(Seq("key")))
    val (kept, _) = DataSkipping.prunedFiles(spark, dir,
      Seq(EqVal("key", "b42")))
    assert(kept.size < 4)
    spark.sql("DROP TABLE IF EXISTS silver.ts")
  }

  test("incremental analyze profiles only new files; old entries survive") {
    val dir = tmpDir("skip-incr") + "/t"
    writeRangeLayout(dir, n = 800, files = 4)
    assert(DataSkipping.analyze(spark, dir, Seq("id"),
      bloomCols = Seq("key")) == 4)
    // two appended files, disjoint id ranges
    spark.range(10000L, 10400L).toDF("id")
      .withColumn("grp", lit("9")).withColumn("key", concat(lit("k"), col("id")))
      .repartitionByRange(2, col("id")).sortWithinPartitions("id")
      .write.mode("append").parquet(dir)
    assert(DataSkipping.analyzeIncremental(spark, dir) == 2)
    assert(DataSkipping.analyzeIncremental(spark, dir) == 0, "idempotent")
    // new files now PRUNE (before the refresh they were always-read)
    val (keptNew, total) = DataSkipping.prunedFiles(spark, dir,
      Seq(Range("id", Some(10000L), None)))
    assert(total == 6 && keptNew.size == 2)
    val (keptOld, _) = DataSkipping.prunedFiles(spark, dir,
      Seq(Range("id", Some(0L), Some(100L))))
    assert(keptOld.size == 1, "pre-existing entries must survive the merge")
    // bloom recipe was replayed for the fresh files too
    val (keptKey, _) = DataSkipping.prunedFiles(spark, dir,
      Seq(EqVal("key", "k10123")))
    assert(keptKey.size <= 2)
  }

  test("COPY INTO keeps the skipping manifest live across appends") {
    val wh = tmpDir("skip-copy")
    val src = s"$wh/landing"; val t = s"$wh/table"
    spark.range(100L).toDF("id").coalesce(1).write.parquet(src)
    graft.ingest.CopyInto.run(spark, t, src, "parquet")
    DataSkipping.analyze(spark, t, Seq("id"))
    spark.range(5000L, 5100L).toDF("id").coalesce(1)
      .write.mode("append").parquet(src)
    graft.ingest.CopyInto.run(spark, t, src, "parquet")
    // the newly copied file is profiled without a full re-analyze
    val (kept, total) = DataSkipping.prunedFiles(spark, t,
      Seq(Range("id", Some(5000L), None)))
    assert(total >= 2 && kept.size == 1,
      s"copied file must carry stats (kept $kept of $total)")
  }

  test("SkippingPruneRule: plain SQL filters prune transparently on extension sessions") {
    // extension session (MergeSqlSpec's pattern) — the rule is injected
    // pre-CBO, so ORDINARY spark.sql reads get the manifest's pruning
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-skiprule-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(base)
    org.apache.spark.sql.SparkSession.setActiveSession(base)

    val dir = tmpDir("skip-rule") + "/t"
    import s.implicits._
    s.range(4000L).toDF("id")
      .withColumn("grp", (col("id") % 5).cast("string"))
      .repartitionByRange(8, col("id"))
      .sortWithinPartitions("id")
      .write.parquet(dir)
    DataSkipping.analyze(s, dir, Seq("id"))
    s.sql(s"CREATE TABLE skipt USING parquet LOCATION '$dir'")

    val q = s.sql("SELECT id, grp FROM skipt WHERE id >= 100 AND id <= 220")
    // the scan was rebuilt over the surviving files (marker index in plan)
    assert(q.queryExecution.executedPlan.toString
      .contains("GraftPrunedFileIndex"),
      s"rule did not prune:\n${q.queryExecution.executedPlan}")
    assert(q.inputFiles.length <= 2,
      s"expected <=2 surviving files, got ${q.inputFiles.length}")
    // and the rows are EXACTLY the unpruned filter's
    val full = s.read.parquet(dir)
      .where(col("id") >= 100L && col("id") <= 220L).select("id", "grp")
    assert(rowsOf(q, "id") == rowsOf(full, "id"))

    // non-prunable predicates leave the plan alone
    val np = s.sql("SELECT id FROM skipt WHERE id % 7 = 0")
    assert(!np.queryExecution.executedPlan.toString
      .contains("GraftPrunedFileIndex"))
    assert(np.count() == s.read.parquet(dir)
      .where(col("id") % 7 === 0).count())

    // tables without a manifest are untouched (fast path)
    val dir2 = tmpDir("skip-rule2") + "/t"
    s.range(100L).toDF("id").write.parquet(dir2)
    s.sql(s"CREATE TABLE skipt2 USING parquet LOCATION '$dir2'")
    val un = s.sql("SELECT id FROM skipt2 WHERE id >= 10")
    assert(!un.queryExecution.executedPlan.toString
      .contains("GraftPrunedFileIndex"))
    assert(un.count() == 90)

    // a NON-parquet relation over a directory carrying a `_skipping`
    // manifest (e.g. a dir formerly analyzed as parquet, then rewritten
    // as CSV with the manifest left behind) must NOT be pruned — the
    // stats describe different data and would silently drop rows. Plant a
    // manifest claiming id ∈ [0, 10] for every CSV file: if the rule
    // consults it, the id >= 100 filter prunes ALL files.
    val dir3 = tmpDir("skip-rule3") + "/t"
    s.range(200L).toDF("id").repartition(4)
      .write.option("header", "true").csv(dir3)
    val b64 = (x: String) =>
      java.util.Base64.getEncoder.encodeToString(x.getBytes("UTF-8"))
    val csvFiles = new java.io.File(dir3).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName)
    val skipDir = new java.io.File(dir3, "_skipping"); skipDir.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(skipDir, "stats.tsv"))
    try {
      w.println("#graft-skipping\t1\t1024\t4")
      csvFiles.foreach(n => w.println(Seq(b64(n), "50", "id", "long",
        b64("0"), b64("10"), "0", "-").mkString("\t")))
    } finally w.close()
    val csv = s.read.option("header", "true").schema("id BIGINT")
      .csv(dir3).where(col("id") >= 100L)
    assert(!csv.queryExecution.executedPlan.toString
      .contains("GraftPrunedFileIndex"),
      "skipping rule must not touch non-parquet relations")
    assert(csv.count() == 100)
    s.sql("DROP TABLE skipt"); s.sql("DROP TABLE skipt2")
  }

  test("BloomAgg: no false negatives, low false-positive rate") {
    val df = spark.range(2000L).toDF("id")
      .withColumn("key", concat(lit("v"), col("id")))
    val bits = df.agg(BloomAgg.bloomAgg(col("key")).as("b"))
      .collect()(0).getAs[Array[Byte]]("b")
    val m = BloomAgg.DefaultBits; val k = BloomAgg.DefaultHashes
    (0L until 2000L).foreach { i =>
      assert(BloomAgg.mightContain(bits, s"v$i", m, k),
        s"false negative for v$i")
    }
    val fp = (0 until 2000).count(i =>
      BloomAgg.mightContain(bits, s"absent$i", m, k))
    assert(fp < 60, s"false-positive rate too high: $fp/2000")
  }

  test("distributed manifest resolution (threshold 0) prunes exactly " +
      "like the driver path and the switch shows in DESCRIBE DETAIL") {
    val dir = tmpDir("skip-dist") + "/t"
    writeRangeLayout(dir)
    DataSkipping.analyze(spark, dir, Seq("id"), bloomCols = Seq("key"))
    val preds = Seq(Range("id", Some(100L), Some(220L)))
    val (keptDriver, totalDriver) =
      DataSkipping.prunedFiles(spark, dir, preds)
    try {
      // force every manifest over the threshold: resolution runs as a
      // Spark job over the TSV (the Delta large-checkpoint path)
      spark.conf.set("graft.skipping.distributedThresholdBytes", "0")
      val (keptJob, totalJob) = DataSkipping.prunedFiles(spark, dir, preds)
      assert(totalJob == totalDriver)
      assert(keptJob.sorted == keptDriver.sorted,
        "distributed resolution disagreed with the driver parse")
      // pruned == unpruned-filtered THROUGH the job path
      val pruned = DataSkipping.read(spark, dir, preds)
      assert(pruned.inputFiles.length == keptJob.size)
      val full = spark.read.parquet(dir)
        .where(col("id") >= 100L && col("id") <= 220L)
      assert(rowsOf(pruned, "id") == rowsOf(full, "id"))
      // bloom predicates take the job path too (the stat payload the
      // driver never parses in this mode)
      val eq = DataSkipping.read(spark, dir, Seq(EqVal("key", "k150")))
      assert(rowsOf(eq, "id") ==
        rowsOf(spark.read.parquet(dir).where(col("key") === "k150"), "id"))
      // threshold switch is observable: DESCRIBE DETAIL reports the mode
      val cat = new graft.catalog.Catalog(spark, tmpDir("skip-dist-wh"))
      cat.create(spark.range(100L).toDF("id"), "silver", "skipdist")
      cat.register("silver", "skipdist")
      cat.analyzeSkipping("silver", "skipdist", Seq("id"))
      try {
        assert(graft.sql.GraftSql.sql(spark, "DESCRIBE DETAIL silver.skipdist")
          .collect().head.getAs[String]("skipping_resolution")
          == "distributed")
        spark.conf.unset("graft.skipping.distributedThresholdBytes")
        assert(graft.sql.GraftSql.sql(spark, "DESCRIBE DETAIL silver.skipdist")
          .collect().head.getAs[String]("skipping_resolution") == "driver")
      } finally spark.sql("DROP TABLE IF EXISTS silver.skipdist")
    } finally
      spark.conf.unset("graft.skipping.distributedThresholdBytes")
  }
}
