package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorMean

/** Typed Aggregator surface: per-label centroids via VectorMean must equal
  * the posexplode+avg formulation, across partition merges. */
class VectorMeanSpec extends SparkSuite {

  test("typed centroid equals posexplode avg (multi-partition merge)") {
    import spark.implicits._
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .repartition(8)
    val typedCentroids = e
      .select(col("label"), col("embedding"))
      .as[(String, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(VectorMean.toColumn.name("centroid"))
      .collect().toMap
      .map { case (k, v) => k -> v.toSeq }
    // untyped cross-check
    val viaExplode = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("m"))
      .collect().groupBy(_.get(0).toString)
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
    assert(typedCentroids.keySet == viaExplode.keySet)
    typedCentroids.foreach { case (k, c) =>
      val ex = viaExplode(k)
      assert(c.size == ex.size)
      c.zip(ex).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("empty input yields empty centroid") {
    import spark.implicits._
    val out = Seq.empty[Array[Float]].toDS()
      .select(VectorMean.toColumn.name("c")).collect()
    assert(out.head.isEmpty)
  }
}
