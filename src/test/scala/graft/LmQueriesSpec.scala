package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.{LmQueries, Similarity}

/** Hand-computed fixed points for the q200–q202 LM/eval surface:
  * stupid-backoff probabilities on a planted train/score split (seen
  * bigram, backed-off bigram, OOV token), BLEU's clipped-precision
  * textbook example (Papineni et al. 2002 §2.1's "the the the…"
  * degenerate candidate), and a 2×2 covariance matrix verified against
  * the population formula. All integer-exact, so assertions are
  * equalities. */
class LmQueriesSpec extends SparkSuite {
  import spark.implicits._

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, String, Long)]): Unit =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("q200: seen bigram, stupid backoff, and OOV score by hand") {
    val dir = tmpDir("graft-lm")
    // even doc_ids train the model: uni a=3 b=3 c=1 (N=7);
    // bigrams (a,b)=2 (b,a)=1 (a,c)=1 (b,b)=1
    writeDocs(dir, Seq(
      (0L, "a b a c", "en", "s", 7L),
      (2L, "a b b", "en", "s", 5L),
      (1L, "a b z", "en", "s", 5L),
      (3L, "c a", "en", "s", 3L)))
    val out = LmQueries.backoffLm(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: a (first, 3/7) + b ((a,b)=2 / c(a)=3) + z (OOV, 0)
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_tokens") == 3)
    assert(d1.getAs[Long]("n_oov") == 1)
    assert(d1.getAs[Long]("n_backoff") == 0)
    assert(d1.getAs[Long]("sum_p_ppm") == 428571L + 666666L)
    assert(d1.getAs[Long]("avg_p_ppm") == 1095237L / 3)
    // doc 3: c (first, 1/7) + a (bigram (c,a) unseen → 0.4 · 3/7)
    val d3 = out(3L)
    assert(d3.getAs[Long]("n_backoff") == 1)
    assert(d3.getAs[Long]("n_oov") == 0)
    assert(d3.getAs[Long]("sum_p_ppm") == 142857L + 171428L)
    // training docs score too (their grams are all seen)
    assert(out(0L).getAs[Long]("n_oov") == 0 &&
      out(0L).getAs[Long]("n_backoff") == 0)
  }

  test("q201: clipping kills the degenerate candidate (BLEU §2.1)") {
    val dir = tmpDir("graft-bleu")
    // within source s, candidate 1's reference is the previous doc 0
    writeDocs(dir, Seq(
      (0L, "the cat the cat on the mat", "en", "s", 27L),
      (1L, "the the the the the the the", "en", "s", 27L)))
    val rows = LmQueries.bleuRouge(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("cand_id") == 1 && r.getAs[Long]("ref_id") == 0)
    // candidate has 7 "the"; reference holds only 3 → clip1 = 3
    assert(r.getAs[Long]("c1") == 7 && r.getAs[Long]("clip1") == 3)
    assert(r.getAs[Long]("p1_ppm") == 428571L)
    assert(r.getAs[Long]("rouge1_ppm") == 428571L) // ref len is also 7
    // no "the the" bigram in the reference → p2 = 0 → composite 0
    assert(r.getAs[Long]("clip2") == 0 && r.getAs[Long]("p2_ppm") == 0)
    assert(r.getAs[Long]("bp_ppm") == 1000000L)
    assert(r.getAs[Long]("bleu2_ppm") == 0)
  }

  test("q201: single-token candidate yields NULL bigram metrics") {
    val dir = tmpDir("graft-bleu1")
    writeDocs(dir, Seq(
      (0L, "a b", "en", "s", 3L),
      (1L, "a", "en", "s", 1L)))
    val r = LmQueries.bleuRouge(spark, dir).collect().head
    assert(r.getAs[Long]("c2") == 0)
    assert(r.isNullAt(r.fieldIndex("p2_ppm")))
    assert(r.isNullAt(r.fieldIndex("bleu2_ppm")))
    // brevity: |c| = 1, |r| = 2 → 500000
    assert(r.getAs[Long]("bp_ppm") == 500000L)
  }

  test("q203: total variation by hand; identical sources give 0") {
    val dir = tmpDir("graft-tv")
    // A = {x:2/3, y:1/3}, B = {x:1/2, z:1/2} →
    // TV = ½(|2/3−1/2| + 1/3 + 1/2) = ½ exactly
    writeDocs(dir, Seq(
      (0L, "x x y", "en", "A", 5L),
      (1L, "x z", "en", "B", 3L),
      (2L, "x x y", "en", "C", 5L))) // C is a clone of A → TV(A,C) = 0
    val out = LmQueries.sourceTv(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 3)
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("n_shared") == 1)
    assert(ab.getAs[Long]("tv_ppb") == 499999999L) // ½ minus DIV dust
    val ac = out(("A", "C"))
    assert(ac.getAs[Long]("n_shared") == 2)
    assert(ac.getAs[Long]("tv_ppb") == 0L)
  }

  test("q202: 2-dim covariance matches the population formula") {
    val dir = tmpDir("graft-cov")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = Seq(
      Row(0L, Seq(1.0f, 2.0f), 0),
      Row(1L, Seq(3.0f, 6.0f), 0))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.embedCovariance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out.size == 3) // (1,1) (1,2) (2,2)
    // dims in milli-units: x = [1000, 3000], y = [2000, 6000]
    // var(x) = 1.0 raw² = 1e6 milli²; cov(x,y) = 2.0 → 2e6; var(y) = 4e6
    assert(out((1L, 1L)).getAs[Long]("cov_m2") == 1000000L)
    assert(out((1L, 2L)).getAs[Long]("cov_m2") == 2000000L)
    assert(out((2L, 2L)).getAs[Long]("cov_m2") == 4000000L)
    assert(out((1L, 2L)).getAs[Long]("s_ij") == 20000000L)
    assert(out((1L, 2L)).getAs[Long]("n") == 2L)
  }
}
