package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** q216 power iteration: on a corpus with one planted high-variance
  * axis, the dominant direction must concentrate on that axis. */
class SpectralSpec extends SparkSuite {
  import spark.implicits._

  test("q216 dominant direction finds a planted high-variance axis") {
    val d = 8
    val hot = 3 // the planted axis (0-based)
    // deterministic rows: the hot axis alternates ±0.5 (variance 0.25);
    // every other axis carries a tiny fixed ±0.001 ripple so the
    // covariance is not degenerate
    val rows = (0 until 64).map { r =>
      val v = Array.tabulate(d) { i =>
        if (i == hot) (if (r % 2 == 0) 0.5f else -0.5f)
        else (if ((r + i) % 2 == 0) 0.001f else -0.001f)
      }
      (r.toLong, v.toSeq, 0)
    }.toDF("vec_id", "embedding", "label")
    val dir = tmpDir("spec") + "/t"
    rows.write.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.dominantDirection(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("v_ppm")).toMap
    assert(got.size == d)
    val hotMag = math.abs(got(hot + 1L)) // dims are 1-based
    assert(hotMag == got.values.map(v => math.abs(v)).max,
      s"hot axis is not dominant: $got")
    got.filterNot(_._1 == hot + 1L).foreach { case (dim, v) =>
      assert(math.abs(v) * 10 <= hotMag,
        s"off-axis dim $dim too large ($v vs hot $hotMag)")
    }
    // the max-normalized iterate stays in the ppm band (truncating
    // normalizer: [1e6, 2e6))
    assert(hotMag >= 1000000L && hotMag < 2000000L)
  }

  test("q223 centroid affinity: identical-mean labels read 1.0, " +
      "orthogonal labels read 0.0") {
    val d = 4
    def vec(axis: Int, scale: Float) =
      (0 until d).map(i => if (i == axis) scale else 0.0f)
    // labels 0 and 1 share their mean direction (axis 0, different
    // scales and counts); label 2 is orthogonal (axis 2)
    val rows = Seq(
      (0L, vec(0, 0.5f), 0), (1L, vec(0, 0.7f), 0),
      (2L, vec(0, 0.6f), 1), (3L, vec(0, 0.6f), 1), (4L, vec(0, 0.6f), 1),
      (5L, vec(2, 0.8f), 2), (6L, vec(2, 0.4f), 2))
      .toDF("vec_id", "embedding", "label")
    val dir = tmpDir("aff") + "/t"
    rows.write.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.centroidAffinity(spark, dir).collect()
      .map(r => (r.getAs[Int]("la"), r.getAs[Int]("lb")) ->
        r.getAs[Double]("cos")).toMap
    assert(got((0, 1)) == 1.0, s"colinear centroids: ${got((0, 1))}")
    assert(got((0, 2)) == 0.0 && got((1, 2)) == 0.0,
      s"orthogonal centroids: $got")
  }
}
