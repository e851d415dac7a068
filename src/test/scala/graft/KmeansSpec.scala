package graft

import graft.operators.Similarity

/** Lloyd's k-means loop: determinism, convergence, objective descent, and
  * agreement between the returned centroids and the assignment pass. */
class KmeansSpec extends SparkSuite {

  private def vectors(): Map[Long, Array[Double]] =
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private def centroidMap(df: org.apache.spark.sql.DataFrame)
      : Map[Int, Array[Double]] =
    df.collect().groupBy(_.getInt(0)).map { case (cid, rows) =>
      cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
    }

  /** Within-cluster sum of squared distances, driver-side (500×64 test
    * fixture — trivial). */
  private def sse(cents: Map[Int, Array[Double]],
      assign: Map[Long, Int], vs: Map[Long, Array[Double]]): Double =
    vs.map { case (id, v) =>
      val c = cents(assign(id))
      v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum

  test("kmeans is deterministic, converges, and descends the objective") {
    val vs = vectors()
    val (c1df, r1) = Similarity.kmeans(spark, sf0001, k = 10, maxIters = 12)
    val (c2df, r2) = Similarity.kmeans(spark, sf0001, k = 10, maxIters = 12)
    assert(r1 == r2, "round counts must match across runs")
    assert(rowsOf(c1df, "cluster", "pos") == rowsOf(c2df, "cluster", "pos"),
      "centroids must be bit-identical across runs")
    assert(r1 >= 1 && r1 <= 12)

    // every vector gets exactly one cluster
    val a = Similarity.assignToCentroids(spark, sf0001, c1df)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.size == vs.size)

    // the trained clustering beats the seed partition (vec_id % k carries
    // no signal, so any structure in the embeddings must improve SSE)
    val init = vs.keys.map(id => id -> (id % 10).toInt).toMap
    val initCents = (0 until 10).map { cid =>
      val members = vs.filter { case (id, _) => init(id) == cid }.values
      cid -> members.transpose.map(xs => xs.sum / members.size).toArray
    }.toMap
    val trained = sse(centroidMap(c1df), a, vs)
    val seed = sse(initCents, init, vs)
    assert(trained < seed * 0.999,
      s"k-means must descend the objective: trained=$trained seed=$seed")
  }

  test("kmeans and kcenterCoreset with a reliable checkpointDir return " +
      "bit-identical results and materialize into the dir") {
    val ckpt = tmpDir("iter-ckpt")
    val (c1df, r1) = Similarity.kmeans(spark, sf0001, k = 10, maxIters = 3)
    val (c2df, r2) = Similarity.kmeans(spark, sf0001, k = 10, maxIters = 3,
      checkpointDir = Some(ckpt))
    assert(r1 == r2)
    assert(rowsOf(c1df, "cluster", "pos") == rowsOf(c2df, "cluster", "pos"))
    val kc1 = Similarity.kcenterCoreset(spark, sf0001, k = 4)
      .collect().map(_.toSeq).toSeq
    val kc2 = Similarity.kcenterCoreset(spark, sf0001, k = 4,
      checkpointDir = Some(ckpt)).collect().map(_.toSeq).toSeq
    assert(kc1 == kc2)
    def rdds(d: java.io.File): Int =
      if (!d.exists()) 0
      else d.listFiles().map(f =>
        if (f.isDirectory)
          (if (f.getName.startsWith("rdd-")) 1 else 0) + rdds(f)
        else 0).sum
    assert(rdds(new java.io.File(ckpt)) >= 4,
      "reliable checkpoints not materialized")
  }

  test("one extra round never increases the objective (Lloyd guarantee)") {
    val vs = vectors()
    val byIters = (1 to 3).map { it =>
      val (cdf, _) = Similarity.kmeans(spark, sf0001, k = 10, maxIters = it)
      val assign = Similarity.assignToCentroids(spark, sf0001, cdf)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      sse(centroidMap(cdf), assign, vs)
    }
    byIters.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"objective rose across rounds: $byIters")
    }
  }
}
