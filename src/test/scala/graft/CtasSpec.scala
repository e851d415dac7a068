package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.sql.GraftSql

/** Versioned CTAS (`CREATE [OR REPLACE] TABLE layer.t AS SELECT …`): the
  * created table must be born through the swap protocol — version 1 with
  * history, time travel, DESCRIBE HISTORY operation stamped — and
  * registered; OR REPLACE commits the next version (schema change
  * allowed, registration rebuilt); a plain CREATE on an existing target
  * refuses; a query with no graft-managed source has no warehouse anchor
  * and refuses. Both parser paths (GraftSql.sql and the extension
  * session's spark.sql) lower to the same command.
  */
class CtasSpec extends SparkSuite {
  import spark.implicits._

  private lazy val sqlSpark: SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ctas-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("CTAS is born versioned and registered; OR REPLACE commits v2 with schema change") {
    val cat = new Catalog(spark, tmpDir("graft-ctas"))
    cat.overwriteSnapshot(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "grp", "amt"), "silver", "ctas_src")
    cat.register("silver", "ctas_src")

    GraftSql.sql(spark,
      """CREATE TABLE gold.ctas_agg AS
         SELECT grp, count(*) AS n, sum(amt) AS total
         FROM silver.ctas_src GROUP BY grp""")
    // registered + correct
    assert(rowsOf(spark.table("gold.ctas_agg"), "grp") ==
      Seq(Seq("a", 2L, 40.0), Seq("b", 1L, 20.0)))
    // born versioned: version 1, operation stamped
    assert(cat.currentVersion("gold", "ctas_agg") == 1)
    val ops = Catalog.historyRows(spark, cat.path("gold", "ctas_agg"))
      .map(_._6)
    assert(ops.contains("CREATE TABLE AS SELECT"), s"ops=$ops")

    // plain CREATE on an existing target refuses
    val e = intercept[Exception] {
      GraftSql.sql(spark,
        "CREATE TABLE gold.ctas_agg AS SELECT * FROM silver.ctas_src")
    }
    assert(e.getMessage.contains("OR REPLACE"), e.getMessage)

    // OR REPLACE: next version, schema may change, old version travels
    GraftSql.sql(spark,
      """CREATE OR REPLACE TABLE gold.ctas_agg AS
         SELECT grp, max(amt) AS max_amt FROM silver.ctas_src GROUP BY grp""")
    assert(cat.currentVersion("gold", "ctas_agg") == 2)
    assert(spark.table("gold.ctas_agg").columns.toSeq ==
      Seq("grp", "max_amt"))
    assert(rowsOf(cat.readVersion("gold", "ctas_agg", 1), "grp") ==
      Seq(Seq("a", 2L, 40.0), Seq("b", 1L, 20.0)),
      "replaced version must stay time-travelable")

    spark.sql("DROP TABLE gold.ctas_agg")
    spark.sql("DROP TABLE silver.ctas_src")
  }

  test("CTAS PARTITIONED BY lays out hive partitions and stays versioned") {
    val cat = new Catalog(spark, tmpDir("graft-ctas-part"))
    cat.overwriteSnapshot(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "grp", "amt"), "silver", "ctas_psrc")
    cat.register("silver", "ctas_psrc")
    GraftSql.sql(spark,
      """CREATE TABLE gold.ctas_part PARTITIONED BY (grp) AS
         SELECT id, amt, grp FROM silver.ctas_psrc""")
    val dir = cat.path("gold", "ctas_part")
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("grp="))
    assert(parts.toSet == Set("grp=a", "grp=b"), s"got ${parts.toSeq}")
    assert(cat.currentVersion("gold", "ctas_part") == 1)
    assert(spark.read.parquet(dir).count() == 3)
    spark.sql("DROP TABLE gold.ctas_part")
    spark.sql("DROP TABLE silver.ctas_psrc")
  }

  test("CTAS without a graft-managed source refuses (no warehouse anchor)") {
    val e = intercept[Exception] {
      GraftSql.sql(spark, "CREATE TABLE gold.ctas_nowhere AS SELECT 1 AS x")
    }
    assert(e.getMessage.contains("graft-managed source"), e.getMessage)
  }

  test("OR REPLACE refuses to clobber a materialized view's state") {
    val cat = new Catalog(spark, tmpDir("graft-ctas-mv"))
    cat.overwriteSnapshot(Seq((1L, "a", 5.0)).toDF("id", "grp", "amt"),
      "silver", "ctas_mvsrc")
    cat.register("silver", "ctas_mvsrc")
    GraftSql.sql(spark,
      """CREATE MATERIALIZED VIEW gold.ctas_mv AS
         SELECT grp, sum(amt) AS s FROM silver.ctas_mvsrc GROUP BY grp""")
    val e = intercept[Exception] {
      GraftSql.sql(spark,
        """CREATE OR REPLACE TABLE gold.ctas_mv AS
           SELECT * FROM silver.ctas_mvsrc""")
    }
    assert(e.getMessage.contains("materialized view"), e.getMessage)
    GraftSql.sql(spark, "DROP MATERIALIZED VIEW gold.ctas_mv")
    spark.sql("DROP TABLE silver.ctas_mvsrc")
  }

  test("extension session: native-looking CTAS text lowers onto the version log") {
    val s = sqlSpark
    import s.implicits._
    val cat = new Catalog(s, tmpDir("graft-ctas-ext"))
    cat.overwriteSnapshot(Seq((1L, 5.0), (2L, 7.0)).toDF("id", "v"),
      "silver", "ctas_ext_src")
    cat.register("silver", "ctas_ext_src")
    s.sql("""CREATE TABLE gold.ctas_ext AS
             SELECT id, v * 2 AS v2 FROM silver.ctas_ext_src""")
    assert(rowsOf(s.table("gold.ctas_ext"), "id") ==
      Seq(Seq(1L, 10.0), Seq(2L, 14.0)))
    assert(cat.currentVersion("gold", "ctas_ext") == 1,
      "extension-path CTAS must also be versioned")
    s.sql("DROP TABLE gold.ctas_ext")
    s.sql("DROP TABLE silver.ctas_ext_src")
  }
}
