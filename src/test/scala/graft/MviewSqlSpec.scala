package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.Catalog

/** `CREATE / REFRESH MATERIALIZED VIEW` — the SQL surface over
  * [[graft.pipeline.MaterializedAgg]]: incremental O(changes) refresh
  * from the change feed, FULL recompute for non-append history, both
  * parser paths. */
class MviewSqlSpec extends SparkSuite {
  import spark.implicits._

  private lazy val sqlSpark: SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-mview-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private def stateOf(s: SparkSession, name: String): Map[String, (Long, Long)] =
    s.table(name).collect()
      .map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("s"), r.getAs[Long]("n")))).toMap

  test("CREATE computes the initial state; REFRESH folds only appended rows") {
    val cat = new Catalog(spark, tmpDir("graft-mv1"))
    cat.overwriteSnapshot(Seq(("a", 10L), ("a", 20L), ("b", 5L))
      .toDF("k", "v"), "silver", "src")
    cat.register("silver", "src")
    graft.sql.GraftSql.sql(spark,
      """CREATE MATERIALIZED VIEW gold.mv1 AS
         SELECT k, sum(v) AS s, count(*) AS n
         FROM silver.src GROUP BY k""")
    assert(stateOf(spark, "gold.mv1") ==
      Map("a" -> ((30L, 2L)), "b" -> ((5L, 1L))))
    // append-only source change folds incrementally
    Catalog.appendPath(spark, Seq(("a", 1L), ("c", 7L)).toDF("k", "v"),
      cat.path("silver", "src"))
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mv1")
    assert(stateOf(spark, "gold.mv1") ==
      Map("a" -> ((31L, 3L)), "b" -> ((5L, 1L)), "c" -> ((7L, 1L))))
    // in-sync refresh is a no-op (and the high-water mark holds)
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mv1")
    assert(stateOf(spark, "gold.mv1")("a") == ((31L, 3L)))
    spark.sql("DROP TABLE gold.mv1"); spark.sql("DROP TABLE silver.src")
  }

  test("WHERE and expression aggregates survive the definition round trip") {
    val cat = new Catalog(spark, tmpDir("graft-mv2"))
    cat.overwriteSnapshot(Seq(("a", 2L, 3L), ("a", 4L, 5L), ("b", 1L, 1L),
      ("skip", 100L, 100L)).toDF("k", "x", "y"), "silver", "src2")
    cat.register("silver", "src2")
    graft.sql.GraftSql.sql(spark,
      """CREATE MATERIALIZED VIEW gold.mv2 AS
         SELECT k, sum(x * y) AS s, count(*) AS n
         FROM silver.src2 WHERE k <> 'skip' GROUP BY k""")
    assert(stateOf(spark, "gold.mv2") ==
      Map("a" -> ((26L, 2L)), "b" -> ((1L, 1L))))
    // the WHERE must gate refresh batches too (definition read from the
    // sidecar, not session state)
    Catalog.appendPath(spark,
      Seq(("b", 2L, 3L), ("skip", 9L, 9L)).toDF("k", "x", "y"),
      cat.path("silver", "src2"))
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mv2")
    assert(stateOf(spark, "gold.mv2") ==
      Map("a" -> ((26L, 2L)), "b" -> ((7L, 2L))))
    spark.sql("DROP TABLE gold.mv2"); spark.sql("DROP TABLE silver.src2")
  }

  test("sum/count views RETRACT deleted source rows; emptied groups vanish") {
    val cat = new Catalog(spark, tmpDir("graft-mv3"))
    cat.overwriteSnapshot(Seq(("a", 10L), ("a", 20L), ("b", 5L))
      .toDF("k", "v"), "silver", "src3")
    cat.register("silver", "src3")
    graft.sql.GraftSql.sql(spark,
      """CREATE MATERIALIZED VIEW gold.mv3 AS
         SELECT k, sum(v) AS s, count(*) AS n
         FROM silver.src3 GROUP BY k""")
    // an UPDATE (delete old + insert new in the feed) and a full group
    // removal, in one source rewrite — sum/count fold the deletes as
    // negated partials, no recompute
    cat.overwriteSnapshot(Seq(("a", 10L), ("a", 25L)).toDF("k", "v"),
      "silver", "src3")
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mv3")
    assert(stateOf(spark, "gold.mv3") == Map("a" -> ((35L, 2L))),
      "retraction diverged from a full recompute (b must vanish)")
    // later append still folds incrementally
    Catalog.appendPath(spark, Seq(("b", 2L)).toDF("k", "v"),
      cat.path("silver", "src3"))
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mv3")
    assert(stateOf(spark, "gold.mv3") ==
      Map("a" -> ((35L, 2L)), "b" -> ((2L, 1L))))
    spark.sql("DROP TABLE gold.mv3"); spark.sql("DROP TABLE silver.src3")
  }

  test("a crash between delta apply and cursor commit replays as a no-op") {
    // the exactly-once window: REFRESH applies its delta (committed with
    // the state), then commits the feed cursor. A crash in between makes
    // the NEXT refresh re-consume the same (from, to] — the refreshId is
    // the source version, so the replay trips the in-state guard instead
    // of double-counting. Simulated by rolling the cursor back by hand.
    val cat = new Catalog(spark, tmpDir("graft-mvreplay"))
    val cursor = cat.path("gold", "mvr") + ".mviewcursor"
    cat.overwriteSnapshot(Seq(("a", 10L)).toDF("k", "v"), "silver", "srcr")
    cat.register("silver", "srcr")
    graft.sql.GraftSql.sql(spark,
      """CREATE MATERIALIZED VIEW gold.mvr AS
         SELECT k, sum(v) AS s, count(*) AS n
         FROM silver.srcr GROUP BY k""")
    // append path: v2 folded, then "crash" loses the cursor commit
    Catalog.appendPath(spark, Seq(("a", 5L), ("b", 2L)).toDF("k", "v"),
      cat.path("silver", "srcr"))                                    // v2
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mvr")
    val afterAppend = Map("a" -> ((15L, 2L)), "b" -> ((2L, 1L)))
    assert(stateOf(spark, "gold.mvr") == afterAppend)
    graft.catalog.ChangeFeed.commitCursor(spark, cursor, 1)
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mvr")
    assert(stateOf(spark, "gold.mvr") == afterAppend,
      "replayed append delta double-counted")
    // retraction path: a rewrite consumed, cursor commit lost
    cat.overwriteSnapshot(Seq(("a", 15L)).toDF("k", "v"),
      "silver", "srcr")                                              // v3
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mvr")
    val afterRetract = Map("a" -> ((15L, 1L)))
    assert(stateOf(spark, "gold.mvr") == afterRetract)
    graft.catalog.ChangeFeed.commitCursor(spark, cursor, 2)
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mvr")
    assert(stateOf(spark, "gold.mvr") == afterRetract,
      "replayed retraction delta double-applied")
    // FULL path: recompute committed at v4, cursor commit lost — the
    // replayed incremental delta must drop against the recomputed state
    Catalog.appendPath(spark, Seq(("c", 9L)).toDF("k", "v"),
      cat.path("silver", "srcr"))                                    // v4
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mvr FULL")
    val afterFull = Map("a" -> ((15L, 1L)), "c" -> ((9L, 1L)))
    assert(stateOf(spark, "gold.mvr") == afterFull)
    graft.catalog.ChangeFeed.commitCursor(spark, cursor, 3)
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mvr")
    assert(stateOf(spark, "gold.mvr") == afterFull,
      "delta replayed on top of a FULL recompute double-counted")
    spark.sql("DROP TABLE gold.mvr"); spark.sql("DROP TABLE silver.srcr")
  }

  test("a retraction that empties the state keeps the watermark (no ghost groups)") {
    // every group's count reaches zero → prune leaves ZERO state rows,
    // which used to take the in-state high-water mark with it: the next
    // lastRefreshId read NPE'd, and a crash-replayed delete delta would
    // re-fold into NEGATIVE ghost groups. The watermark now also rides a
    // commit tag on the same swap.
    val cat = new Catalog(spark, tmpDir("graft-mvempty"))
    val cursor = cat.path("gold", "mve") + ".mviewcursor"
    cat.overwriteSnapshot(Seq(("a", 10L), ("b", 5L)).toDF("k", "v"),
      "silver", "srce")
    cat.register("silver", "srce")
    graft.sql.GraftSql.sql(spark,
      """CREATE MATERIALIZED VIEW gold.mve AS
         SELECT k, sum(v) AS s, count(*) AS n
         FROM silver.srce GROUP BY k""")
    // v2: remove EVERYTHING — both groups vanish on the count-zero rule
    cat.overwriteSnapshot(
      spark.emptyDataset[(String, Long)].toDF("k", "v"), "silver", "srce")
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mve")
    assert(spark.table("gold.mve").count() == 0)
    // crash-replay of the emptying delta onto the empty state: must drop
    // whole, not fold negated partials into count=-1 ghosts
    graft.catalog.ChangeFeed.commitCursor(spark, cursor, 1)
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mve")
    assert(spark.table("gold.mve").count() == 0,
      "replayed retraction created ghost groups on the empty state")
    // and the view still works: later appends fold incrementally
    Catalog.appendPath(spark, Seq(("c", 7L)).toDF("k", "v"),
      cat.path("silver", "srce"))
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mve")
    assert(stateOf(spark, "gold.mve") == Map("c" -> ((7L, 1L))))
    spark.sql("DROP TABLE gold.mve"); spark.sql("DROP TABLE silver.srce")
  }

  test("min/max views demand FULL on non-append history; FULL recomputes and re-pins") {
    val cat = new Catalog(spark, tmpDir("graft-mv3b"))
    cat.overwriteSnapshot(Seq(("a", 10L), ("b", 5L)).toDF("k", "v"),
      "silver", "src3b")
    cat.register("silver", "src3b")
    graft.sql.GraftSql.sql(spark,
      """CREATE MATERIALIZED VIEW gold.mv3b AS
         SELECT k, max(v) AS mx, count(*) AS n
         FROM silver.src3b GROUP BY k""")
    // removing the max row cannot be folded — extremal aggregates do not
    // retract
    cat.overwriteSnapshot(Seq(("a", 10L)).toDF("k", "v"),
      "silver", "src3b")
    val e = intercept[IllegalArgumentException] {
      graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mv3b")
    }
    assert(e.getMessage.contains("FULL"))
    // state untouched by the failed refresh
    assert(spark.table("gold.mv3b").count() == 2)
    graft.sql.GraftSql.sql(spark,
      "REFRESH MATERIALIZED VIEW gold.mv3b FULL")
    assert(spark.table("gold.mv3b").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 10L, 1L)))
    // and the cursor re-pinned: a later append folds incrementally again
    Catalog.appendPath(spark, Seq(("b", 2L)).toDF("k", "v"),
      cat.path("silver", "src3b"))
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.mv3b")
    assert(spark.table("gold.mv3b").count() == 2)
    spark.sql("DROP TABLE gold.mv3b"); spark.sql("DROP TABLE silver.src3b")
  }

  test("DROP MATERIALIZED VIEW removes state, sidecar, cursor, registration") {
    val root = tmpDir("graft-mv6")
    val cat = new Catalog(spark, root)
    cat.overwriteSnapshot(Seq(("a", 1L)).toDF("k", "v"), "silver", "src6")
    cat.register("silver", "src6")
    graft.sql.GraftSql.sql(spark,
      """CREATE MATERIALIZED VIEW gold.mv6 AS
         SELECT k, sum(v) AS s, count(*) AS n
         FROM silver.src6 GROUP BY k""")
    // a plain table is refused (DROP MATERIALIZED VIEW must not destroy
    // ordinary data files)
    intercept[IllegalArgumentException] {
      graft.sql.GraftSql.sql(spark, "DROP MATERIALIZED VIEW silver.src6")
    }
    graft.sql.GraftSql.sql(spark, "DROP MATERIALIZED VIEW gold.mv6")
    assert(!spark.catalog.tableExists("gold.mv6"))
    val dir = new java.io.File(cat.path("gold", "mv6"))
    assert(!dir.exists && !new java.io.File(dir.getPath + ".mviewdef").exists
      && !new java.io.File(dir.getPath + ".mviewcursor").exists,
      "view artifacts left behind")
    spark.sql("DROP TABLE silver.src6")
  }

  test("non-algebraic or malformed definitions are rejected") {
    val cat = new Catalog(spark, tmpDir("graft-mv4"))
    cat.overwriteSnapshot(Seq(("a", 1L)).toDF("k", "v"), "silver", "src4")
    cat.register("silver", "src4")
    intercept[IllegalArgumentException] { // avg is not algebraic
      graft.sql.GraftSql.sql(spark,
        """CREATE MATERIALIZED VIEW gold.bad AS
           SELECT k, avg(v) AS a FROM silver.src4 GROUP BY k""")
    }
    intercept[IllegalArgumentException] { // unaliased aggregate
      graft.sql.GraftSql.sql(spark,
        """CREATE MATERIALIZED VIEW gold.bad AS
           SELECT k, sum(v) FROM silver.src4 GROUP BY k""")
    }
    intercept[IllegalArgumentException] { // no GROUP BY
      graft.sql.GraftSql.sql(spark,
        """CREATE MATERIALIZED VIEW gold.bad AS
           SELECT sum(v) AS s FROM silver.src4""")
    }
    spark.sql("DROP TABLE silver.src4")
  }

  test("join-shaped views lower onto MaterializedJoin; REFRESH pulls both feeds") {
    val cat = new Catalog(spark, tmpDir("graft-mvj"))
    cat.overwriteSnapshot(Seq((1L, 10L, 5.0), (2L, 11L, 6.0), (3L, 12L, 7.0))
      .toDF("oid", "cust", "amt"), "silver", "jfact")
    cat.overwriteSnapshot(Seq((10L, "alice"), (11L, "bob"))
      .toDF("c_id", "c_name"), "silver", "jdim")
    cat.register("silver", "jfact"); cat.register("silver", "jdim")
    graft.sql.GraftSql.sql(spark,
      """CREATE MATERIALIZED VIEW gold.wide KEY (oid) AS
         SELECT f.*, d.c_name FROM silver.jfact f
         LEFT JOIN silver.jdim d ON f.cust = d.c_id""")
    // public registration is clean: no bucket column, queryable via SQL
    assert(spark.table("gold.wide").columns.toSeq ==
      Seq("oid", "cust", "amt", "c_name"))
    def state = spark.table("gold.wide").collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(state == Map(1L -> Some("alice"), 2L -> Some("bob"), 3L -> None))
    // fact append + dim SCD1 update, one REFRESH applies both feeds
    Catalog.appendPath(spark, Seq((4L, 11L, 9.0)).toDF("oid", "cust", "amt"),
      cat.path("silver", "jfact"))
    cat.overwriteSnapshot(Seq((10L, "alicia"), (11L, "bob"), (12L, "carol"))
      .toDF("c_id", "c_name"), "silver", "jdim")
    graft.sql.GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW gold.wide")
    assert(state == Map(1L -> Some("alicia"), 2L -> Some("bob"),
      3L -> Some("carol"), 4L -> Some("bob")))
    // KEY is mandatory for the join shape; missing → clear error
    val e = intercept[IllegalArgumentException] {
      graft.sql.GraftSql.sql(spark,
        """CREATE MATERIALIZED VIEW gold.wide2 AS
           SELECT f.*, d.c_name FROM silver.jfact f
           LEFT JOIN silver.jdim d ON f.cust = d.c_id""")
    }
    assert(e.getMessage.contains("KEY"))
    // DROP cleans the view registration, data table, state, cursors
    graft.sql.GraftSql.sql(spark, "DROP MATERIALIZED VIEW gold.wide")
    assert(!spark.catalog.tableExists("gold.wide"))
    assert(!spark.catalog.tableExists("gold.wide__data"))
    assert(!new java.io.File(cat.path("gold", "wide")).exists)
    assert(!new java.io.File(cat.path("gold", "wide") + ".cursors").exists)
    spark.sql("DROP TABLE silver.jfact"); spark.sql("DROP TABLE silver.jdim")
  }

  test("extension-session parser handles both statements") {
    val s = sqlSpark
    import s.implicits._
    val cat = new Catalog(s, tmpDir("graft-mv5"))
    cat.overwriteSnapshot(Seq(("a", 3L), ("b", 4L)).toDF("k", "v"),
      "silver", "src5")
    cat.register("silver", "src5")
    s.sql("""CREATE MATERIALIZED VIEW gold.mv5 AS
             SELECT k, sum(v) AS s, count(*) AS n
             FROM silver.src5 GROUP BY k""")
    assert(stateOf(s, "gold.mv5") ==
      Map("a" -> ((3L, 1L)), "b" -> ((4L, 1L))))
    Catalog.appendPath(s, Seq(("a", 5L)).toDF("k", "v"),
      cat.path("silver", "src5"))
    s.sql("REFRESH MATERIALIZED VIEW gold.mv5")
    assert(stateOf(s, "gold.mv5") ==
      Map("a" -> ((8L, 2L)), "b" -> ((4L, 1L))))
    s.sql("DROP TABLE gold.mv5"); s.sql("DROP TABLE silver.src5")
  }
}
