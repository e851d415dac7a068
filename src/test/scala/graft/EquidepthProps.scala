package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TextQueries

/** Property pins for the equi-depth range bucketing behind q244
  * (fixed-seed scalacheck over adversarial id distributions): whatever
  * the id clustering — tight bands, snowflake gaps, mixtures —
  * (1) `rangeBucket` over `equidepthSplits` keeps the max bucket
  * population within a constant factor of uniform, and (2) the
  * bucketing is ORDER-COMPATIBLE: a lower id never lands in a higher
  * bucket than a higher id — the property the two-phase prefix sum's
  * correctness actually rests on (balance only buys performance). */
class EquidepthProps extends SparkSuite {
  import spark.implicits._

  /** Adversarial id-space generator: 1-4 clusters, each a tight band
    * at a random magnitude (1e3..1e15), plus optional sparse
    * stragglers — the timestamp-prefixed/snowflake shapes a uniform
    * (max-min)/n split collapses on. */
  private val idsGen: Gen[Seq[Long]] = for {
    nClusters <- Gen.chooseNum(1, 4)
    clusters <- Gen.listOfN(nClusters, for {
      mag <- Gen.chooseNum(3, 15)
      base <- Gen.chooseNum(1L, 9L)
      n <- Gen.chooseNum(200, 1500)
      width <- Gen.chooseNum(1L, 4L * n)
    } yield {
      val lo = base * math.pow(10, mag).toLong
      (0 until n).map(i => lo + (i.toLong * width) / n)
    })
    stragglers <- Gen.listOf(Gen.chooseNum(0L, Long.MaxValue / 4))
  } yield (clusters.flatten ++ stragglers).distinct

  test("equi-depth buckets stay near-uniform and order-compatible on " +
      "adversarially clustered id spaces") {
    val n = 16
    (1 to 8).foreach { cse =>
      val ids = idsGen.apply(Gen.Parameters.default, Seed(9043L + cse)).get
      val df = ids.toDF("doc_id")
      val splits = TextQueries.equidepthSplits(df, "doc_id", n)
      assert(splits.sorted.sameElements(splits), "splits must be sorted")
      val got = df
        .withColumn("b", TextQueries.rangeBucket(col("doc_id"), splits))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      // (2) order compatibility: bucket is monotone in the id
      val byId = got.sortBy(_._1).map(_._2)
      assert(byId.sameElements(byId.sorted),
        s"case $cse: bucket not monotone in doc_id")
      // (1) balance: max population ≤ 4× uniform (approxQuantile err
      // 0.001 + duplicate-split collapse leave margin; the uniform
      // split fails this by orders of magnitude on these fixtures)
      val counts = got.groupBy(_._2).map(_._2.size)
      val uniform = ids.size.toDouble / n
      assert(counts.max <= math.max(4 * uniform, 8.0),
        s"case $cse: max bucket ${counts.max} vs uniform $uniform " +
          s"(${ids.size} ids, ${counts.size} buckets)")
    }
  }
}
