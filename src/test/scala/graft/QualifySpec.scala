package graft

import org.apache.spark.sql.SparkSession

import graft.sql.GraftSql

/** The QUALIFY clause surface (Databricks/Snowflake/DuckDB SQL; absent
  * from Spark's grammar): GraftSql lowers a top-level QUALIFY into a
  * hidden-column subquery filter. Covered: window-predicate filtering,
  * CTE prefixes, ORDER BY/LIMIT tails, both entry points (parser
  * extension and GraftSql.sql), and the declared unsupported shapes. */
class QualifySpec extends SparkSuite {

  /** Dedicated session WITH the parser extension (see MergeSqlSpec). */
  private lazy val sqlSpark: SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-qualify-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private def seed(s: SparkSession): Unit = {
    import s.implicits._
    Seq((1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L),
      (4L, "b", 5L), (5L, "b", 50L))
      .toDF("id", "grp", "v").createOrReplaceTempView("q_t")
  }

  test("QUALIFY filters on a window predicate (top-1 per group)") {
    val s = sqlSpark
    seed(s)
    val out = s.sql(
      """SELECT id, grp, v FROM q_t
         QUALIFY row_number() OVER (PARTITION BY grp ORDER BY v DESC) = 1
         ORDER BY grp""").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 5L))
    // the hidden column must not leak into the output schema
    assert(out.head.schema.fieldNames.toSeq == Seq("id", "grp", "v"))
  }

  test("QUALIFY after GROUP BY evaluates over the aggregated rows") {
    val s = sqlSpark
    seed(s)
    val out = s.sql(
      """SELECT grp, sum(v) AS total FROM q_t GROUP BY grp
         QUALIFY rank() OVER (ORDER BY sum(v) DESC) = 1""").collect()
    assert(out.length == 1 && out(0).getString(0) == "a" &&
      out(0).getLong(1) == 60L)
  }

  test("QUALIFY under a CTE prefix and a LIMIT tail") {
    val s = sqlSpark
    seed(s)
    val out = s.sql(
      """WITH big AS (SELECT * FROM q_t WHERE v >= 10)
         SELECT id, v FROM big
         QUALIFY row_number() OVER (ORDER BY v DESC, id) <= 3
         ORDER BY v DESC LIMIT 2""").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(5L, 2L))
  }

  test("GraftSql.sql entry point lowers QUALIFY without the parser extension") {
    seed(spark)
    val out = GraftSql.sql(spark,
      """SELECT id, grp FROM q_t
         QUALIFY v = max(v) OVER (PARTITION BY grp)
         ORDER BY id""").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 5L))
  }

  test("unsupported QUALIFY shapes fail with clear errors; literals never trip the scanner") {
    val s = sqlSpark
    seed(s)
    val e1 = intercept[Exception](s.sql(
      "SELECT DISTINCT grp FROM q_t QUALIFY rank() OVER (ORDER BY grp) = 1"))
    assert(e1.getMessage.contains("DISTINCT"))
    val e2 = intercept[Exception](s.sql(
      """SELECT id FROM q_t UNION ALL SELECT id FROM q_t
         QUALIFY row_number() OVER (ORDER BY id) = 1"""))
    assert(e2.getMessage.contains("UNION"))
    // the word QUALIFY inside a string literal is NOT a clause
    val lit = s.sql("SELECT 'no QUALIFY here' AS msg FROM q_t LIMIT 1")
      .collect()
    assert(lit(0).getString(0) == "no QUALIFY here")
    // * EXCEPT in the select list must not be mistaken for a set op
    val ex = s.sql(
      """SELECT * EXCEPT (grp) FROM q_t
         QUALIFY row_number() OVER (ORDER BY v DESC) = 1""").collect()
    assert(ex(0).schema.fieldNames.toSeq == Seq("id", "v") &&
      ex(0).getLong(0) == 5L)
  }

  test("lowerQualify text fixture: scanner skips quotes, comments, subqueries") {
    // QUALIFY at depth > 0 (inside a subquery) is the subquery's problem —
    // the outer statement must pass through untouched
    assert(GraftSql.lowerQualify(
      "SELECT * FROM (SELECT 1 AS x) t WHERE x IN (SELECT 1)").isEmpty)
    assert(GraftSql.lowerQualify(
      "SELECT '-- QUALIFY' AS s FROM t").isEmpty)
    val lowered = GraftSql.lowerQualify(
      "SELECT a FROM t QUALIFY rn = 1 ORDER BY a").get
    assert(lowered.contains("__graft_qualify") &&
      lowered.endsWith("ORDER BY a"))
  }
}
