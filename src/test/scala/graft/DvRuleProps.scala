package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Fuzz of the transparent deletion-vector rule: on an extension
  * session, ordinary `spark.sql` over DV-carrying tables must return
  * EXACTLY what the explicit DV-applied read returns, across random
  * data, random deletes, and a battery of query shapes (scans, filters,
  * aggregates, self-joins, limits-by-sort). The rule rewrites relations
  * mid-optimizer — the failure mode is silently wrong rows, which is
  * why it gets the DataSkippingProps treatment, not just directed
  * cases. */
class DvRuleProps extends SparkSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("plain SQL over DV tables equals the explicit DV-applied read") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-dvrule-props")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    try {
      import s.implicits._
      (1 to 3).foreach { c =>
        val dir = tmpDir(s"dvrule$c") + "/t"
        val n = 50 + c * 30
        val rows = (1 to n).map { i =>
          (i.toLong, sample(Gen.chooseNum(-20L, 20L), c * 1000L + i),
            s"g${i % 7}")
        }
        rows.toDF("id", "v", "grp").repartition(3).write.parquet(dir)
        s.sql(s"CREATE TABLE dvp$c USING parquet LOCATION '$dir'")
        graft.layout.DeletionVectors.enable(s, dir)
        // two stacked random deletes
        val m1 = sample(Gen.chooseNum(2, 5), c * 7L)
        val m2 = sample(Gen.chooseNum(2, 6), c * 11L)
        s.sql(s"DELETE FROM dvp$c WHERE id % $m1 = 0")
        s.sql(s"DELETE FROM dvp$c WHERE v % $m2 = 1")
        assert(graft.layout.DeletionVectors.hasDv(s, dir))

        val explicit = graft.layout.DeletionVectors.readPath(s, dir)
        def expectRows(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(_.toSeq).toSeq
            .sortBy(_.mkString("|"))
        val queries = Seq(
          s"SELECT * FROM dvp$c",
          s"SELECT id, v FROM dvp$c WHERE v > 0",
          s"SELECT grp, count(*) AS n, sum(v) AS sv FROM dvp$c GROUP BY grp",
          s"SELECT a.id, b.id FROM dvp$c a JOIN dvp$c b ON a.v = b.v " +
            "AND a.id < b.id",
          s"SELECT id FROM dvp$c ORDER BY v DESC, id LIMIT 10")
        val expects = Seq(
          explicit,
          explicit.filter(col("v") > 0).select("id", "v"),
          explicit.groupBy("grp").agg(count(lit(1)).as("n"),
            sum("v").as("sv")),
          explicit.alias("a").join(explicit.alias("b"),
            col("a.v") === col("b.v") && col("a.id") < col("b.id"))
            .select(col("a.id"), col("b.id")),
          explicit.orderBy(col("v").desc, col("id")).select("id").limit(10))
        queries.zip(expects).zipWithIndex.foreach { case ((q, e), i) =>
          assert(expectRows(s.sql(q)) == expectRows(e),
            s"case $c query $i diverged from the explicit DV read: $q")
        }
        // and the rule really fired (not equal-by-luck on an unpruned read)
        assert(s.sql(s"SELECT count(*) FROM dvp$c").collect()
          .head.getLong(0) < n, s"case $c: deletes did not apply via SQL")
      }
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
