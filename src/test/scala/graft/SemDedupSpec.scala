package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Similarity

/** SemDeDup semantics on a fixture where the answer is provable by hand:
  * twelve exactly-orthogonal one-hot vectors (pairwise cosine 0) plus one
  * planted clone of vec 7 at vec 17 (cosine 1). The clone shares vec 7's
  * seed cluster (17 % 10 = 7) and both sit at distance 0 from that
  * cluster's centroid, so the only in-cluster pair above any positive
  * threshold is (7, 17) — the later id must be dropped, everything else
  * kept. */
class SemDedupSpec extends SparkSuite {

  private def writeFixture(): String = {
    val dim = 32
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)
    val rows = (0 to 11).map(i => Row(i.toLong, oneHot(i), i % 10)) :+
      Row(17L, oneHot(7), 7) // clone of vec 7, same seed cluster
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val dir = tmpDir("graft-semdedup")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planted clone is dropped, earlier id and all singletons kept") {
    val dir = writeFixture()
    val out = Similarity.semanticDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.size == 13)
    assert(out(17L) == 0L, "the later-id clone must be dropped")
    assert(out.filter(_._1 != 17L).values.forall(_ == 1L),
      s"only the clone may be dropped; got $out")
  }

  test("clone and original share a cluster; drop decision is id-ordered") {
    val dir = writeFixture()
    val byId = Similarity.semanticDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(byId(7L)._1 == byId(17L)._1, "clone must land with its original")
    assert(byId(7L)._2 == 1L && byId(17L)._2 == 0L,
      "the keep rule is earliest id wins")
  }
}
