package graft

import org.apache.spark.sql.functions._

import graft.operators.TextQueries

/** q58's contract: seeded stratified sampling is deterministic per run
  * and hits the requested per-stratum fractions within Bernoulli noise. */
class SamplingSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.01"

  test("same seed, same sample (run-to-run determinism)") {
    val a = TextQueries.stratifiedSample(spark, sfDir).collect().toSeq
    val b = TextQueries.stratifiedSample(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("per-stratum fractions within tolerance; unlisted strata excluded") {
    val total = Tables.load(spark, sfDir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = TextQueries.stratifiedSample(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // full-fraction strata come through complete
    Seq("de", "fr", "es").foreach(l => assert(sampled(l) == total(l)))
    // down-sampled strata land near the target (±6 sigma of Bernoulli)
    def check(l: String, f: Double): Unit = {
      val n = total(l).toDouble
      val tol = 6 * math.sqrt(n * f * (1 - f))
      assert(math.abs(sampled(l) - n * f) <= tol,
        s"$l: got ${sampled(l)} want ~${n * f} ± $tol")
    }
    check("en", 0.25)
    check("zh", 0.5)
  }
}
