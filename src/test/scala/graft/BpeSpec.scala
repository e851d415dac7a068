package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** BPE trainer + native encode expression: the textbook merge sequence,
  * greedy lowest-rank inference, and the lossless-reconstruction property
  * over the real fixture corpus. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private val vocab = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    .toDF("word", "freq")

  test("trainMerges reproduces the classic merge sequence") {
    // hand-computed: es (9) ties st (9) → lexicographic; then (es,t) 9;
    // then lo (7) ties ow (7) → lexicographic
    assert(Bpe.trainMerges(vocab, 3) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("encode applies merges greedily by rank; unseen words stay chars") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    def enc(w: String): Seq[String] =
      Seq(w).toDF("w").select(Bpe.bpeEncode(col("w"), merges).as("t"))
        .collect()(0).getSeq[String](0)
    assert(enc("lowest") == Seq("lo", "w", "est"))
    assert(enc("newest") == Seq("n", "e", "w", "est"))
    assert(enc("zap") == Seq("z", "a", "p"))
    assert(enc("x") == Seq("x"))
    assert(enc("es") == Seq("es"))
    // empty merge table degrades to character tokens
    assert(Seq("abc").toDF("w")
      .select(Bpe.bpeEncode(col("w"), Nil).as("t"))
      .collect()(0).getSeq[String](0) == Seq("a", "b", "c"))
  }

  test("bpe_encode is SQL-addressable with a literal merge table") {
    org.apache.spark.sql.GraftShims.registerFunction(spark,
      org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_encode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.BpeEncode].getName, "bpe_encode"),
      graft.functions.GraftExtensions.bpeDescriptor._3)
    Seq("lowest").toDF("w").createOrReplaceTempView("bpe_in")
    val out = spark.sql(
      "SELECT bpe_encode(w, 'e s,es t,l o') AS t FROM bpe_in")
      .collect()(0).getSeq[String](0)
    assert(out == Seq("lo", "w", "est"))
  }

  test("corpus-trained merges encode losslessly and compress the corpus") {
    val docs = Tables.load(spark, sf0001, "documents").limit(100)
    val merges = Bpe.trainMerges(Bpe.vocabOf(docs), 10)
    assert(merges.size == 10)
    val words = docs
      .select(explode(graft.functions.TextFunctions.words(col("text")))
        .as("w"))
    val encoded = words.select(col("w"),
      Bpe.bpeEncode(col("w"), merges).as("toks"))
    // lossless: concatenating a word's tokens reproduces the word
    assert(encoded
      .filter(array_join(col("toks"), "") =!= col("w")).count() == 0)
    // compressive: merges strictly reduce total token count vs characters
    val Seq(nToks, nChars) = encoded
      .agg(sum(size(col("toks"))), sum(length(col("w"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Long])
    assert(nToks < nChars, s"merges must compress: $nToks vs $nChars")
  }
}
