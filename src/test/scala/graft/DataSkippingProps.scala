package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.layout.DataSkipping

/** Property-based soundness fuzz for transparent data skipping: the one
  * catastrophic failure mode of stats pruning is SILENT ROW LOSS (a file
  * wrongly skipped), so random SQL filters — negatives, nulls, boundary
  * literals, strings, IN lists, mixed prunable/unprunable conjuncts —
  * through the extension session (where [[graft.layout.SkippingPruneRule]]
  * rewrites the scan) must return EXACTLY the rows of the same filter on
  * an unpruned read. Fixed-seed sampling (the MergeProps pattern). */
class DataSkippingProps extends SparkSuite {

  // predicate fragments over (id BIGINT incl. negatives, d DOUBLE with
  // nulls, s STRING): comparisons in both orientations, equality, IN, and
  // an unprunable modulo conjunct the rule must leave to the residual
  private def fragGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-1200L, 1200L).map(v => s"id >= $v"),
    Gen.chooseNum(-1200L, 1200L).map(v => s"id < $v"),
    Gen.chooseNum(-1200L, 1200L).map(v => s"$v <= id"),
    Gen.chooseNum(-1200L, 1200L).map(v => s"id = $v"),
    Gen.chooseNum(-12L, 12L).map(v => s"d > ${v * 0.5}"),
    Gen.chooseNum(-12L, 12L).map(v => s"d <= ${v * 0.5}"),
    Gen.oneOf("k0", "k1", "k2", "q").map(v => s"s >= '$v'"),
    Gen.oneOf("k00", "k13", "k25", "zz").map(v => s"s = '$v'"),
    Gen.listOfN(3, Gen.chooseNum(-1100L, 1100L))
      .map(vs => s"id IN (${vs.mkString(", ")})"),
    Gen.chooseNum(2L, 9L).map(v => s"id % $v = 0"))

  private def predGen: Gen[String] =
    Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, fragGen).map(_.mkString(" AND ")))

  test("random filters through the prune rule equal the unpruned read") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-skipprops-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(base)
    org.apache.spark.sql.SparkSession.setActiveSession(base)

    val dir = tmpDir("skip-props") + "/t"
    // ids span negative..positive across range-sorted files so min/max
    // stats are tight and a wrong-side-of-zero or string-vs-numeric
    // ordering bug would actually skip a file with matching rows
    s.range(-1000L, 1000L).toDF("id")
      .withColumn("d", when(col("id") % 7 === 0, lit(null))
        .otherwise(col("id") * 0.01))
      .withColumn("s", concat(lit("k"),
        lpad(pmod(col("id"), lit(26)).cast("string"), 2, "0")))
      .repartitionByRange(8, col("id"))
      .sortWithinPartitions("id")
      .write.parquet(dir)
    DataSkipping.analyze(s, dir, Seq("id", "d", "s"), bloomCols = Seq("id"))
    s.sql(s"CREATE TABLE skip_props USING parquet LOCATION '$dir'")

    var prunedAtLeastOnce = false
    (1 to 40).foreach { i =>
      val pred = predGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val q = s.sql(s"SELECT id, d, s FROM skip_props WHERE $pred")
      if (q.queryExecution.executedPlan.toString
          .contains("GraftPrunedFileIndex")) prunedAtLeastOnce = true
      val expect = base.read.parquet(dir).where(expr(pred))
        .select("id", "d", "s")
      assert(rowsOf(q, "id") == rowsOf(expect, "id"),
        s"case $i: pruned read diverged for predicate: $pred")
    }
    // the fuzz must actually exercise the pruning path, not just the
    // fall-through
    assert(prunedAtLeastOnce, "no sampled predicate triggered the rule")
    s.sql("DROP TABLE skip_props")
  }
}
