package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.words

/** Keyword retrieval over the corpus — the inverted-index/BM25 counterpart
  * to the embedding-space search in [[Similarity]] (a training-data
  * pipeline needs BOTH: lexical lookup for decontamination/QA audits,
  * vector search for semantic dedup). Term statistics (tf, df, dl, avgdl)
  * are classic inverted-index postings computed as plain aggregations;
  * ranking is BM25 with the RATIONAL idf form
  * `(N - df + 0.5)/(df + 0.5)` — the log of the classic formula is
  * monotone in this ratio, so single-term rankings are identical and
  * multi-term rankings agree except where log-damping would reorder
  * near-ties; the rational form is chosen because every arithmetic step is
  * a single IEEE operation both engines evaluate identically, making the
  * score hash-comparable (`ln` rounding is libm-dependent — the one
  * expression that could NOT be oracle-checked exactly).
  *
  * Scale shape: tf is explode → two-phase count (map-side combine); the
  * postings frame is filtered to the QUERY terms before any join, so the
  * joined state is O(matching docs × query terms), not O(corpus vocab);
  * df and the global (N, avgdl) row are broadcast. Top-k is a global
  * `ORDER BY LIMIT k` — Spark's TakeOrderedAndProject, no full sort. */
object SearchQueries {

  private val K1 = 1.2
  private val B = 0.75

  /** BM25 top-k for a fixed conjunction-free keyword query. Per-term
    * contributions are pivoted to columns and added in fixed order so the
    * floating-point sum is deterministic across engines. */
  def bm25TopK(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "merge", "vector"),
      topK: Int = 25): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val withLen = docs.select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"),
        size(col("ws")).cast("double").as("dl"))
    val global = withLen.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = withLen
      .select(col("doc_id"), col("dl"), explode(col("ws")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "dl", "w")
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    val scored = tf
      .join(broadcast(df), Seq("w"))
      .crossJoin(broadcast(global))
      .withColumn("sc",
        ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          ((col("tf") * lit(K1 + 1.0)) /
            (col("tf") + lit(K1) *
              (lit(1.0 - B) + (lit(B) * (col("dl") / col("avgdl")))))))
    val pivoted = scored.groupBy("doc_id").agg(
      terms.zipWithIndex.map { case (t, i) =>
        max(when(col("w") === t, col("sc"))).as(s"s$i")
      }.head,
      terms.zipWithIndex.map { case (t, i) =>
        max(when(col("w") === t, col("sc"))).as(s"s$i")
      }.tail: _*)
    val total = terms.indices
      .map(i => coalesce(col(s"s$i"), lit(0.0)))
      .reduceLeft[Column](_ + _)
    val nHits = terms.indices
      .map(i => col(s"s$i").isNotNull.cast("long"))
      .reduceLeft[Column](_ + _)
    pivoted
      .select(col("doc_id"), nHits.as("n_hits"),
        (floor(total * 1e6) / 1e6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Out-of-vocabulary / corpus-frequency scoring (the n-gram-LM-free
    * stand-in for perplexity filtering: docs dominated by rare or unseen
    * tokens are low-quality or wrong-language — RefinedWeb/Gopher both
    * gate on exactly this family of signals). Per doc: token count, the
    * count OUTSIDE the corpus's top-100 vocabulary, that as integer ppm,
    * and the mean corpus frequency of the doc's tokens in ppm — ALL
    * integer arithmetic (BIGINT `DIV`), so the oracle hashes exactly.
    *
    * Scale shape: vocabulary counts are one two-phase aggregation; the
    * top-100 list is `ORDER BY LIMIT` (TakeOrderedAndProject, no global
    * sort) and broadcasts as a bounded 100-row set; the per-token
    * frequency lookup joins on the word — corpus-sized on both sides, so
    * it stays an AQE-planned shuffle join (no forced broadcast of a
    * corpus-derived table). Corpus totals are two driver scalars
    * (the q85 precedent). */
  def oovScore(spark: SparkSession, dir: String, topK: Int = 100)
      : DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
    val nTotal = toks.count() // driver scalar, not a data path
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("n"))
    val top = vocab.orderBy(col("n").desc, col("w")).limit(topK)
      .select(col("w"), lit(1).as("__in_top"))
    toks
      .join(vocab, Seq("w"))
      .join(broadcast(top), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("__in_top").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("n")).as("__sum_cnt"))
      .select(col("doc_id"), col("n_words"), col("n_oov"),
        expr("n_oov * 1000000 DIV n_words").as("oov_ppm"),
        expr(s"__sum_cnt * 1000000 DIV (n_words * ${nTotal}L)")
          .as("mean_freq_ppm"))
      .orderBy("doc_id")
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 keyword ranking
    * and an embedding-cosine ranking — the standard two-tower fusion every
    * RAG/retrieval pipeline runs (RRF, Cormack et al. SIGIR'09:
    * score = Σ 1/(k + rank), k=60). Ranks fuse, scores never mix, so the
    * two legs' incomparable scales don't matter. Contributions are scaled
    * INTEGER divisions (1e9 DIV (k + rank)) — exact in any engine.
    *
    * Scale shape: each leg ends in a TakeOrderedAndProject pool of
    * `poolK` rows, so the ranking windows and the fusion join run on two
    * bounded lists (broadcast-sized by construction), never on the
    * corpus. The corpus-sized work is exactly the two legs' own scans,
    * each already audited (q88, q39). */
  def hybridRrf(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "merge", "vector"),
      poolK: Int = 100, topK: Int = 25, rrfK: Int = 60): DataFrame = {
    import graft.operators.Similarity.{dot, l2norm}
    import org.apache.spark.sql.expressions.Window
    // lexical leg: the BM25 pool, ranked (window over poolK rows max)
    val lex = bm25TopK(spark, dir, terms, poolK)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("bm25").desc, col("doc_id").asc))
        .cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    // semantic leg: cosine against a fixed probe vector (vec 0), same pool
    val e = Tables.load(spark, dir, "embeddings")
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), l2norm(col("embedding")).as("qn"))
    val sem = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .withColumn("cos", round(dot(col("embedding"), col("qv")) /
        (l2norm(col("embedding")) * col("qn")), 6))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(poolK)
      .withColumn("sem_rank", row_number()
        .over(Window.orderBy(col("cos").desc, col("vec_id").asc))
        .cast("long"))
      .select(col("vec_id").as("doc_id"), col("sem_rank"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(expr(s"1000000000 DIV ($rrfK + lex_rank)"), lit(0L)) +
        coalesce(expr(s"1000000000 DIV ($rrfK + sem_rank)"), lit(0L)))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(topK)
      .select("doc_id", "lex_rank", "sem_rank", "rrf")
  }

  /** DSIR importance weighting (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): score every raw
    * document by how much more likely its tokens are under a TARGET
    * distribution (here: the `lang = targetLang` slice — "select raw docs
    * that look like the high-resource target") than under the raw-corpus
    * distribution, then resample the top-k. The paper uses hashed n-gram
    * bag-of-words features with add-1 smoothing; this uses the word
    * unigram features directly (no hashing — the feature space already
    * fits, and hash functions are engine-specific so hashed buckets could
    * not be oracle-checked).
    *
    * Arithmetic is the q88/q89 recipe: the per-word likelihood ratio
    * `((ct+1)/(Nt+V)) / ((cr+1)/(Nr+V))` is cross-multiplied into ONE
    * integer-ppm division `(ct+1)*(Nr+V)*1e6 DIV (cr+1)*(Nt+V)` — exact
    * BIGINT in both engines (headroom to ~1e6-token corpora at ppm scale;
    * the log-domain double variant DSIR itself uses is what you'd flip to
    * past that, trading oracle exactness for range). Per-doc weight is the
    * mean token ratio — a sum of exact longs, order-independent.
    *
    * Scale shape: vocabulary stats are one two-phase aggregation; corpus
    * totals (Nr, Nt, V) are a broadcast single-row frame (the q88 `global`
    * precedent); the token→ratio lookup is corpus ⋈ vocab on the word —
    * AQE-planned shuffle join, nothing corpus-derived is force-broadcast.
    * The resampling ACTION is `ORDER BY LIMIT k` (TakeOrderedAndProject,
    * no global sort) joined back as a bounded broadcast list (the q89
    * top-vocab pattern). */
  def dsirWeight(spark: SparkSession, dir: String,
      targetLang: String = "en", topK: Int = 100): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        (col("lang") === targetLang).cast("long").as("is_t"),
        explode(words(col("text"))).as("w"))
    val vocab = toks.groupBy("w")
      .agg(count(lit(1)).as("cr"), sum(col("is_t")).as("ct"))
    val totals = vocab.agg(
      sum(col("cr")).as("nr"), sum(col("ct")).as("nt"),
      count(lit(1)).as("v"))
    val ratio = vocab.crossJoin(broadcast(totals))
      .select(col("w"),
        expr("(ct + 1) * (nr + v) * 1000000 DIV ((cr + 1) * (nt + v))")
          .as("r_ppm"))
    val scored = toks.join(ratio, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("r_ppm")).as("wsum"))
      .select(col("doc_id"), col("n_words"),
        expr("wsum DIV n_words").as("dsir_ppm"))
    val top = scored.orderBy(col("dsir_ppm").desc, col("doc_id").asc)
      .limit(topK).select(col("doc_id"), lit(1L).as("__sel"))
    scored.join(broadcast(top), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("dsir_ppm"),
        coalesce(col("__sel"), lit(0L)).as("picked"))
      .orderBy("doc_id")
  }

  /** Bigram language-model fluency scoring — the CCNet arrangement
    * (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
    * Datasets from Web Crawl Data"): a small LM trained on a clean
    * reference slice scores the entire crawl, and low-likelihood
    * documents are noise, boilerplate, or wrong-language. Reference
    * slice here: `doc_id % 10 == 0` (~10%, standing in for the curated
    * Wikipedia slice CCNet trains its KenLM on). Model: word bigrams
    * with add-1 smoothing over the reference slice; per-transition
    * probability `P(w | prev) = (c(prev,w)+1) / (c(prev)+V)` as exact
    * integer ppm (`(1e6*(c+1)) DIV (cp+V)`), per-doc fluency = the mean
    * transition ppm. CCNet thresholds log-domain perplexity; the mean
    * transition probability is the same signal with exact-integer
    * arithmetic both engines hash identically (the q142 DSIR trade —
    * flip to log-domain doubles past ~1e6-token corpora).
    *
    * Scale shape: bigram and context counts are each one two-phase
    * aggregation over the REFERENCE slice (a corpus fraction); V is a
    * driver scalar (the q89 precedent). Scoring joins the corpus's
    * bigrams against the two count tables on their keys — both
    * corpus-derived, so they stay AQE-planned shuffle joins (no forced
    * broadcast); the per-doc fold is one aggregation. Everything is
    * O(tokens) with map-side combine — the shape that survives 100 TB. */
  def ngramLmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), words(col("text")).as("ws"))
    val isRef = col("doc_id") % 10 === 0
    val bigrams = docs
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => struct(a.as("pw"), b.as("w")))).as("bg"))
      .select(col("doc_id"), col("bg.pw").as("pw"), col("bg.w").as("w"))
    val cb = bigrams.filter(isRef)
      .groupBy("pw", "w").agg(count(lit(1)).as("cb"))
    val cp = bigrams.filter(isRef)
      .groupBy("pw").agg(count(lit(1)).as("cp"))
    val v = docs.filter(isRef)
      .select(explode(col("ws")).as("w")).distinct().count() // driver scalar
    val scored = bigrams
      .join(cb, Seq("pw", "w"), "left")
      .join(cp, Seq("pw"), "left")
      .select(col("doc_id"),
        expr(s"(1000000 * (coalesce(cb, 0) + 1)) DIV " +
          s"(coalesce(cp, 0) + ${v}L)").as("p_ppm"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_ppm")).as("sum_ppm"))
    docs.select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_ppm"), lit(0L)).as("sum_ppm"),
        coalesce(expr("sum_ppm DIV n_bigrams"), lit(0L)).as("fluency_ppm"))
      .orderBy("doc_id")
  }

  /** Hashing-trick linear classifier inference — the fastText-style
    * quality filter (Joulin et al. 2017, "Bag of Tricks for Efficient
    * Text Classification"; feature hashing per Weinberger et al. 2009):
    * features are word unigrams AND bigrams hashed into D=1024 buckets, a
    * model is one weight per bucket, and inference is a single map pass —
    * the gate GPT-3/CCNet/RefinedWeb-style pipelines run over the whole
    * crawl first. Weights here are a fixed deterministic function of the
    * bucket (`(b·37) mod 601`, standing in for a trained parameter
    * table — plan shape and cost are identical to a 1024-entry broadcast
    * lookup of real weights). Score = mean feature weight in exact
    * non-negative-BIGINT ppm (`DIV` truncation only ever sees
    * non-negatives, where Spark and DuckDB agree); keep gate at the
    * weight range's midpoint.
    *
    * Scale shape: ZERO data shuffles — hashing, weight lookup, and the
    * per-doc fold are one codegen'd projection (contrast q142/q145,
    * whose scores need corpus statistics first); the only exchange is
    * the presentation sort. This is why a TRAINED classifier is the
    * cheapest quality gate at 100 TB: each document is touched once. */
  def hashedClassifier(spark: SparkSession, dir: String): DataFrame = {
    def weight(t: Column): Column =
      pmod(conv(substring(md5(concat(t, lit("#qc42"))), 1, 15), 16, 10)
        .cast("long"), lit(1024L)) * 37L % 601L
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), words(col("text")).as("ws"))
      .withColumn("bis", when(size(col("ws")) >= 2,
        zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>")))
      .withColumn("n_feats",
        (size(col("ws")) + size(col("bis"))).cast("long"))
      .withColumn("score_sum",
        aggregate(col("ws"), lit(0L), (acc, w) => acc + weight(w)) +
          aggregate(col("bis"), lit(0L), (acc, w) => acc + weight(w)))
      .select(col("doc_id"), col("n_feats"), col("score_sum"),
        expr("(1000000 * score_sum) DIV n_feats").as("score_ppm"))
      .withColumn("keep", (col("score_ppm") >= 300000000L).cast("int"))
      .orderBy("doc_id")
  }

  /** Classifier reliability curve (calibration audit): q149's score
    * binned into ten 60M-ppm buckets against a ground-truth indicator
    * (lang = 'en' here; a labeled eval slice in production) — the
    * is-the-gate-score-meaningful check run before trusting a quality
    * classifier to throw away crawl data. Per bin: count, integer mean
    * score, and the observed positive rate in exact ppm.
    *
    * Scale shape: q149's zero-shuffle scoring pass + one ten-group
    * hash-agg; the doc join is by key on the same scan. */
  def calibrationCurve(spark: SparkSession, dir: String): DataFrame = {
    val actual = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), (col("lang") === "en").cast("long").as("actual"))
    hashedClassifier(spark, dir)
      .select(col("doc_id"), col("score_ppm"))
      .join(actual, "doc_id")
      .withColumn("bin", expr("score_ppm * 10 DIV 600000001"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(score_ppm) DIV count(1)").as("mean_score_ppm"),
        sum(col("actual")).as("n_actual"))
      .withColumn("actual_ppm", expr("n_actual * 1000000 DIV n_docs"))
      .orderBy("bin")
  }

  /** q207: precision/recall threshold sweep — the curve read before
    * picking a quality-gate cutoff (q176 audits calibration per bin;
    * this audits the OPERATING POINTS). Scores from the q149 hashed
    * classifier, ground truth the same labeled slice; for each of the
    * ten score-decile thresholds: docs admitted at-or-above it, exact
    * TP/FP/FN, and precision/recall in exact integer ppm. The decision
    * this feeds — "which threshold throws away the least good data for
    * a target purity" — is the single highest-leverage knob in a
    * filtered-corpus build.
    *
    * Scale shape: one zero-shuffle scoring pass, one ten-group
    * aggregate, and a ten-row reverse cumulative window — the sweep is
    * O(bins) after the scan no matter the corpus size. */
  def prCurve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val actual = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), (col("lang") === "en").cast("long").as("actual"))
    val perBin = hashedClassifier(spark, dir)
      .select(col("doc_id"), col("score_ppm"))
      .join(actual, "doc_id")
      .withColumn("bin", expr("score_ppm * 10 DIV 600000001"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("actual")).as("pos"))
    val totalPos = perBin.agg(sum(col("pos")).as("total_pos"))
    // reverse-cumulative: everything in bins >= b is admitted at
    // threshold b (ten rows — the window is O(bins) by construction)
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBin
      .withColumn("admitted", sum(col("n")).over(w))
      .withColumn("tp", sum(col("pos")).over(w))
      .crossJoin(broadcast(totalPos))
      .select(col("bin"), col("admitted"), col("tp"),
        (col("admitted") - col("tp")).as("fp"),
        (col("total_pos") - col("tp")).as("fn"),
        expr("1000000 * tp DIV admitted").as("precision_ppm"),
        expr("1000000 * tp DIV greatest(1, total_pos)").as("recall_ppm"))
      .orderBy("bin")
  }

  /** Frequency-ranked vocabulary coverage curve — the tokenizer-budget
    * signal (the Zipf head): for each of the top `topK` corpus words, the
    * cumulative fraction of ALL token occurrences a vocabulary truncated
    * at that rank would cover, in exact ppm. q89 CONSUMES a fixed top-k
    * vocabulary; this query produces the curve that picks k.
    *
    * Scale shape: one explode → two-phase word count; the corpus token
    * total is a broadcast single-row frame; the head is a global
    * `ORDER BY LIMIT topK` (TakeOrderedAndProject, no full sort), and
    * the running sum's single-partition window covers topK rows only —
    * bounded by construction (the q89 top-vocab posture). */
  def vocabCoverage(spark: SparkSession, dir: String, topK: Int = 200)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val totals = vocab.agg(sum(col("c")).as("n_total"))
    val head = Window.orderBy(col("c").desc, col("w").asc)
    vocab.orderBy(col("c").desc, col("w").asc).limit(topK)
      .crossJoin(broadcast(totals))
      .withColumn("rank", row_number().over(head).cast("long"))
      .withColumn("cum_c", sum(col("c")).over(
        head.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col("w"), col("c"), col("cum_c"),
        expr("(1000000 * cum_c) DIV n_total").as("coverage_ppm"))
      .orderBy("rank")
  }

  /** Per-document TF-IDF keyword extraction — the top-3 terms per
    * document by tf·idf with the RATIONAL idf `N/df` (monotone with
    * `log(N/df)`, so single-term per-doc rankings agree with the classic
    * form except at log-damped near-ties — the q88 trade, taken for the
    * same reason: every step is exact BIGINT ppm). The per-doc tag set a
    * corpus browser / domain-audit surface shows next to each document.
    *
    * Scale shape: explode → two-phase (doc, word) tf count; dl and df
    * are two more map-side-combined aggregations; the scoring join is
    * corpus ⋈ vocab on the word — both corpus-derived, AQE-planned
    * shuffle joins, nothing force-broadcast (the q142 posture); top-3 is
    * a per-doc window over that doc's own terms. N is a driver scalar
    * (the q89 precedent). */
  def tfidfKeywords(spark: SparkSession, dir: String, topK: Int = 3)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val nDocs = docs.count() // driver scalar, not a data path
    val tf = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("w").asc)
    tf.join(dl, "doc_id").join(df, "w")
      .withColumn("score_ppm",
        expr(s"(1000000 * tf * ${nDocs}L) DIV (dl * df)"))
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("w"), col("tf"), col("df"),
        col("score_ppm"))
      .orderBy("doc_id", "rank")
  }

  /** PMI collocation extraction — the corpus's top word PAIRS by
    * pointwise mutual information (Church & Hanks 1990), the signal
    * behind multi-word-expression vocab entries and tokenizer merge
    * seeding. The RATIONAL form `(c_xy · N) / (c_x · c_y)` is monotone
    * with `log` PMI (the q88/q154 trade) and stays exact BIGINT ppm;
    * pairs below min-support 5 are noise and dropped before ranking
    * (the standard collocation filter).
    *
    * Scale shape: bigram and unigram counts are each one explode →
    * two-phase hash-agg; the scoring joins are vocab-sized equi-joins
    * (AQE-planned, nothing corpus-derived broadcast); N is a driver
    * scalar (q89 precedent); top-50 is TakeOrderedAndProject. */
  def pmiCollocations(spark: SparkSession, dir: String, topK: Int = 50)
      : DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), words(col("text")).as("ws"))
    val toks = docs.select(explode(col("ws")).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val nTotal = toks.count() // driver scalar, not a data path
    val bi = docs.filter(size(col("ws")) >= 2)
      .select(explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= 5)
    bi.join(uni.select(col("w").as("w1"), col("c").as("c_x")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), Seq("w2"))
      .withColumn("pmi_ppm",
        expr(s"(1000000 * c_xy * ${nTotal}L) DIV (c_x * c_y)"))
      .orderBy(col("pmi_ppm").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
      .select("w1", "w2", "c_xy", "c_x", "c_y", "pmi_ppm")
  }

  /** Integer-exact nDCG@10 per language cohort — the ranking-quality
    * metric a retrieval/reranking pipeline reports next to recall
    * (q177). The "system" ranking is deterministic (n_chars desc — the
    * stand-in for a model score, the q166 convention); graded relevance
    * comes from content ("vector" ⇒ 2, "merge" ⇒ 1, else 0 — a
    * deterministic qrel set). DCG discounts use a ppm lookup table of
    * ⌈1e6/log2(r+1)⌉ constants for ranks 1–10, so there is NO libm log
    * anywhere — both engines evaluate the identical CASE table and the
    * identical `gain·w` integer sums, and nDCG lands as `dcg·1e6 DIV
    * idcg`. IDCG ranks the full cohort by relevance (standard nDCG, not
    * the retrieved-set-only variant).
    *
    * Scale shape: two ROW_NUMBER windows over the same cohort
    * partitioning (one exchange), rank-bounded to 10 rows per cohort
    * before the per-cohort sums — evaluation cost is O(cohorts), and the
    * heavy input (per-doc scores) is scanned once. */
  def ndcgEval(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val discount = (r: String) => s"""CASE $r
      WHEN 1 THEN 1000000 WHEN 2 THEN 630930 WHEN 3 THEN 500000
      WHEN 4 THEN 430677 WHEN 5 THEN 386853 WHEN 6 THEN 356207
      WHEN 7 THEN 333333 WHEN 8 THEN 315465 WHEN 9 THEN 301030
      WHEN 10 THEN 289065 ELSE 0 END"""
    val docs = Tables.load(spark, dir, "documents")
    val graded = docs.select(col("lang"), col("doc_id"), col("n_chars"),
      when(array_contains(words(col("text")), "vector"), 2L)
        .when(array_contains(words(col("text")), "merge"), 1L)
        .otherwise(0L).as("rel"))
      .withColumn("gain", expr("(1 << CAST(rel AS INT)) - 1").cast("long"))
    val sys = Window.partitionBy("lang")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val ideal = Window.partitionBy("lang")
      .orderBy(col("rel").desc, col("n_chars").desc, col("doc_id").asc)
    graded
      .withColumn("r_sys", row_number().over(sys))
      .withColumn("r_ideal", row_number().over(ideal))
      .groupBy("lang").agg(
        sum(when(col("r_sys") <= k && col("rel") > 0, 1L).otherwise(0L))
          .as("rel_retrieved"),
        sum(when(col("r_sys") <= k,
          col("gain") * expr(discount("r_sys"))).otherwise(0L))
          .as("dcg_ppm"),
        sum(when(col("r_ideal") <= k,
          col("gain") * expr(discount("r_ideal"))).otherwise(0L))
          .as("idcg_ppm"))
      .select(col("lang"), col("rel_retrieved"), col("dcg_ppm"),
        col("idcg_ppm"),
        when(col("idcg_ppm") > 0,
          expr("1000000 * dcg_ppm DIV idcg_ppm"))
          .otherwise(lit(0L)).as("ndcg_ppm"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q160_pmi_collocations" ->
      ((s: SparkSession, d: String) => pmiCollocations(s, d)),
    "q154_tfidf_keywords" ->
      ((s: SparkSession, d: String) => tfidfKeywords(s, d)),
    "q149_hashed_classifier" ->
      ((s: SparkSession, d: String) => hashedClassifier(s, d)),
    "q176_calibration" ->
      ((s: SparkSession, d: String) => calibrationCurve(s, d)),
    "q207_pr_curve" ->
      ((s: SparkSession, d: String) => prCurve(s, d)),
    "q151_vocab_coverage" ->
      ((s: SparkSession, d: String) => vocabCoverage(s, d)),
    "q145_ngram_lm" -> ((s: SparkSession, d: String) => ngramLmScore(s, d)),
    "q88_bm25_topk" -> ((s: SparkSession, d: String) => bm25TopK(s, d)),
    "q184_ndcg" -> ((s: SparkSession, d: String) => ndcgEval(s, d)),
    "q89_oov_score" -> ((s: SparkSession, d: String) => oovScore(s, d)),
    "q97_hybrid_rrf" -> ((s: SparkSession, d: String) => hybridRrf(s, d)),
    "q142_dsir_weight" -> ((s: SparkSession, d: String) => dsirWeight(s, d)))

  private val wordsSql = raw"string_split_regex(trim(lower(text)), '\s+')"

  /** q149's scoring CTEs (t → f → s), shared by the q149 and q176
    * oracles: md5-derived bucket→weight, non-negative BIGINT arithmetic
    * (15 hex chars fit BIGINT — the q32 idiom). */
  private val classifierCteSql: String =
    s"""WITH t AS (
          SELECT doc_id, $wordsSql AS ws FROM documents),
        f AS (
          SELECT doc_id, ws,
            CASE WHEN len(ws) >= 2
              THEN list_transform(range(1, len(ws)),
                     i -> ws[i] || ' ' || ws[i + 1])
              ELSE [] END AS bis
          FROM t),
        s AS (
          SELECT doc_id,
            CAST(len(ws) + len(bis) AS BIGINT) AS n_feats,
            CAST(coalesce(list_sum(list_transform(ws, w ->
                ((CAST(('0x' || substring(md5(w || '#qc42'), 1, 15))
                  AS BIGINT) % 1024) * 37) % 601)), 0)
              + coalesce(list_sum(list_transform(bis, w ->
                ((CAST(('0x' || substring(md5(w || '#qc42'), 1, 15))
                  AS BIGINT) % 1024) * 37) % 601)), 0) AS BIGINT)
              AS score_sum
          FROM f)"""

  val oracles: Map[String, String] = Map(
    // same graded qrels, same ppm discount table (no libm log), same
    // full-cohort IDCG and integer `dcg·1e6 // idcg`
    "q184_ndcg" -> {
      val disc = (r: String) => s"""CASE $r
        WHEN 1 THEN 1000000 WHEN 2 THEN 630930 WHEN 3 THEN 500000
        WHEN 4 THEN 430677 WHEN 5 THEN 386853 WHEN 6 THEN 356207
        WHEN 7 THEN 333333 WHEN 8 THEN 315465 WHEN 9 THEN 301030
        WHEN 10 THEN 289065 ELSE 0 END"""
      s"""WITH g AS (
            SELECT lang, doc_id, n_chars,
              CASE WHEN list_contains($wordsSql, 'vector') THEN 3
                   WHEN list_contains($wordsSql, 'merge') THEN 1
                   ELSE 0 END AS gain
            FROM documents),
          r AS (
            SELECT lang, gain,
              row_number() OVER (PARTITION BY lang
                ORDER BY n_chars DESC, doc_id ASC) AS r_sys,
              row_number() OVER (PARTITION BY lang
                ORDER BY gain DESC, n_chars DESC, doc_id ASC) AS r_ideal
            FROM g),
          a AS (
            SELECT lang,
              CAST(sum(CASE WHEN r_sys <= 10 AND gain > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS rel_retrieved,
              CAST(sum(CASE WHEN r_sys <= 10
                THEN gain * (${disc("r_sys")}) ELSE 0 END) AS BIGINT)
                AS dcg_ppm,
              CAST(sum(CASE WHEN r_ideal <= 10
                THEN gain * (${disc("r_ideal")}) ELSE 0 END) AS BIGINT)
                AS idcg_ppm
            FROM r GROUP BY lang)
          SELECT lang, rel_retrieved, dcg_ppm, idcg_ppm,
            CASE WHEN idcg_ppm > 0
              THEN 1000000 * dcg_ppm // idcg_ppm ELSE 0 END AS ndcg_ppm
          FROM a ORDER BY lang"""
    },
    // same min-support filter, same rational-PMI BIGINT ppm, same
    // (score desc, w1, w2) total order at the top-k boundary
    "q160_pmi_collocations" ->
      s"""WITH t AS (
            SELECT doc_id, $wordsSql AS ws FROM documents),
          u AS (
            SELECT w, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT unnest(ws) AS w FROM t) GROUP BY w),
          n AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM u),
          b AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
            FROM (SELECT unnest(ws[1:len(ws)-1]) AS w1,
                    unnest(ws[2:len(ws)]) AS w2
                  FROM t WHERE len(ws) >= 2)
            GROUP BY w1, w2 HAVING count(*) >= 5),
          s AS (
            SELECT b.w1, b.w2, b.c_xy, ux.c AS c_x, uy.c AS c_y,
              (1000000 * b.c_xy * n.n_total) // (ux.c * uy.c) AS pmi_ppm
            FROM b JOIN u ux ON b.w1 = ux.w JOIN u uy ON b.w2 = uy.w
            CROSS JOIN n)
          SELECT w1, w2, c_xy, c_x, c_y, pmi_ppm
          FROM s ORDER BY pmi_ppm DESC, w1, w2 LIMIT 50""",
    // same rational idf, same exact BIGINT ppm division, same
    // (score desc, word asc) per-doc total order
    "q154_tfidf_keywords" ->
      s"""WITH t AS (
            SELECT doc_id, unnest($wordsSql) AS w FROM documents),
          tf AS (
            SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
            FROM t GROUP BY doc_id, w),
          dl AS (
            SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
            FROM tf GROUP BY doc_id),
          df AS (
            SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          s AS (
            SELECT tf.doc_id, tf.w, tf.tf, df.df,
              (1000000 * tf.tf * n.n_docs) // (dl.dl * df.df) AS score_ppm
            FROM tf JOIN dl USING (doc_id) JOIN df USING (w) CROSS JOIN n),
          r AS (
            SELECT doc_id, w, tf, df, score_ppm,
              CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY score_ppm DESC, w) AS BIGINT) AS rank
            FROM s)
          SELECT doc_id, rank, w, tf, df, score_ppm
          FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",
    // same md5-derived bucket→weight function, same non-negative BIGINT
    // arithmetic — the engines hash identically (15 hex chars fit BIGINT,
    // the q32 idiom)
    "q149_hashed_classifier" ->
      s"""$classifierCteSql
          SELECT doc_id, n_feats, score_sum,
            (1000000 * score_sum) // n_feats AS score_ppm,
            CASE WHEN (1000000 * score_sum) // n_feats >= 300000000
              THEN 1 ELSE 0 END AS keep
          FROM s ORDER BY doc_id""",
    // same scoring CTE as q149, binned at 60M-ppm width against the
    // lang='en' indicator — all integer DIV
    "q176_calibration" ->
      s"""$classifierCteSql,
          j AS (
            SELECT s.doc_id,
              (1000000 * s.score_sum) // s.n_feats AS score_ppm,
              CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS actual
            FROM s JOIN documents d ON s.doc_id = d.doc_id)
          SELECT score_ppm * 10 // 600000001 AS bin,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(score_ppm) // count(*) AS BIGINT) AS mean_score_ppm,
            CAST(sum(actual) AS BIGINT) AS n_actual,
            CAST(sum(actual) * 1000000 // count(*) AS BIGINT) AS actual_ppm
          FROM j GROUP BY 1 ORDER BY bin""",
    // q207: same scoring CTE, same decile bins, reverse-cumulative
    // admitted/TP window — all integer DIV
    "q207_pr_curve" ->
      s"""$classifierCteSql,
          j AS (
            SELECT s.doc_id,
              (1000000 * s.score_sum) // s.n_feats AS score_ppm,
              CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS actual
            FROM s JOIN documents d ON s.doc_id = d.doc_id),
          pb AS (
            SELECT score_ppm * 10 // 600000001 AS bin,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(actual) AS BIGINT) AS pos
            FROM j GROUP BY 1),
          cum AS (
            SELECT bin,
              CAST(SUM(n) OVER (ORDER BY bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS admitted,
              CAST(SUM(pos) OVER (ORDER BY bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS tp
            FROM pb),
          tot AS (SELECT CAST(sum(pos) AS BIGINT) AS total_pos FROM pb)
          SELECT bin, admitted, tp,
            admitted - tp AS fp,
            total_pos - tp AS fn,
            1000000 * tp // admitted AS precision_ppm,
            1000000 * tp // greatest(1, total_pos) AS recall_ppm
          FROM cum, tot ORDER BY bin""",
    // same (count desc, word asc) total order — unique words make the
    // LIMIT deterministic; cumulative sum and coverage are exact BIGINT
    "q151_vocab_coverage" ->
      s"""WITH w AS (
            SELECT unnest($wordsSql) AS w FROM documents),
          c AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY w),
          t AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM c),
          top AS (SELECT w, c FROM c ORDER BY c DESC, w LIMIT 200),
          r AS (
            SELECT w, c,
              CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT)
                AS rank,
              CAST(SUM(c) OVER (ORDER BY c DESC, w
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_c
            FROM top)
          SELECT rank, w, c, cum_c,
            (1000000 * cum_c) // t.n_total AS coverage_ppm
          FROM r CROSS JOIN t ORDER BY rank""",
    // same reference slice, same add-1 arithmetic — every probability is
    // an exact BIGINT ppm division, so the engines agree bit for bit
    "q145_ngram_lm" ->
      s"""WITH t AS (
            SELECT doc_id, $wordsSql AS ws FROM documents),
          b AS (
            SELECT doc_id,
              unnest(ws[1:len(ws)-1]) AS pw,
              unnest(ws[2:len(ws)]) AS w
            FROM t WHERE len(ws) >= 2),
          cb AS (SELECT pw, w, count(*) AS cb FROM b
                 WHERE doc_id % 10 = 0 GROUP BY 1, 2),
          cp AS (SELECT pw, count(*) AS cp FROM b
                 WHERE doc_id % 10 = 0 GROUP BY 1),
          vv AS (SELECT count(DISTINCT w) AS v
                 FROM (SELECT unnest(ws) AS w FROM t WHERE doc_id % 10 = 0)),
          s AS (
            SELECT b.doc_id,
              (1000000 * (coalesce(cb.cb, 0) + 1)) //
                (coalesce(cp.cp, 0) + vv.v) AS p_ppm
            FROM b LEFT JOIN cb USING (pw, w) LEFT JOIN cp USING (pw)
            CROSS JOIN vv),
          d AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              CAST(sum(p_ppm) AS BIGINT) AS sum_ppm
            FROM s GROUP BY 1)
          SELECT t.doc_id,
            coalesce(d.n_bigrams, 0) AS n_bigrams,
            coalesce(d.sum_ppm, 0) AS sum_ppm,
            coalesce(d.sum_ppm // d.n_bigrams, 0) AS fluency_ppm
          FROM t LEFT JOIN d USING (doc_id)
          ORDER BY doc_id""",
    // identical expression tree: rational idf, fixed-order pivoted sum,
    // same floor scaling — the doubles must agree bit for bit
    "q88_bm25_topk" ->
      s"""WITH d AS (
            SELECT doc_id, $wordsSql AS ws,
              CAST(len($wordsSql) AS DOUBLE) AS dl
            FROM documents),
          g AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
            FROM d),
          t AS (
            SELECT doc_id, dl, w, CAST(count(*) AS DOUBLE) AS tf
            FROM (SELECT doc_id, dl, unnest(ws) AS w FROM d)
            WHERE w IN ('spark', 'merge', 'vector')
            GROUP BY doc_id, dl, w),
          f AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM t GROUP BY w),
          s AS (
            SELECT t.doc_id, t.w,
              ((g.n_docs - f.df + 0.5) / (f.df + 0.5)) *
                ((t.tf * (1.2 + 1.0)) /
                  (t.tf + 1.2 * ((1.0 - 0.75) + (0.75 * (t.dl / g.avgdl)))))
                AS sc
            FROM t JOIN f USING (w) CROSS JOIN g),
          p AS (
            SELECT doc_id,
              max(CASE WHEN w = 'spark' THEN sc END) AS s0,
              max(CASE WHEN w = 'merge' THEN sc END) AS s1,
              max(CASE WHEN w = 'vector' THEN sc END) AS s2
            FROM s GROUP BY doc_id)
          SELECT doc_id,
            CAST(CASE WHEN s0 IS NULL THEN 0 ELSE 1 END
               + CASE WHEN s1 IS NULL THEN 0 ELSE 1 END
               + CASE WHEN s2 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS n_hits,
            floor(((coalesce(s0, 0.0) + coalesce(s1, 0.0)) + coalesce(s2, 0.0))
              * 1000000.0) / 1000000.0 AS bm25
          FROM p ORDER BY bm25 DESC, doc_id LIMIT 25""",
    // same top-100 vocabulary (count desc, word asc), same BIGINT integer
    // divisions — no floating point anywhere
    "q89_oov_score" ->
      s"""WITH w AS (
            SELECT doc_id, unnest($wordsSql) AS w FROM documents),
          c AS (SELECT w, count(*) AS n FROM w GROUP BY w),
          t AS (SELECT w FROM c ORDER BY n DESC, w LIMIT 100),
          d AS (
            SELECT doc_id, count(*) AS n_words,
              sum(CASE WHEN w.w IN (SELECT w FROM t) THEN 0 ELSE 1 END)
                AS n_oov,
              sum(c.n) AS sum_cnt
            FROM w JOIN c USING (w) GROUP BY doc_id)
          SELECT doc_id,
            CAST(n_words AS BIGINT) AS n_words,
            CAST(n_oov AS BIGINT) AS n_oov,
            CAST(n_oov * 1000000 // n_words AS BIGINT) AS oov_ppm,
            CAST(sum_cnt * 1000000 //
              (n_words * (SELECT count(*) FROM w)) AS BIGINT)
              AS mean_freq_ppm
          FROM d ORDER BY doc_id""",
    // same two pools (q88's BM25 tree verbatim; q39's cosine arithmetic),
    // same integer RRF contributions — nothing here can diverge
    "q97_hybrid_rrf" ->
      s"""WITH d AS (
            SELECT doc_id, $wordsSql AS ws,
              CAST(len($wordsSql) AS DOUBLE) AS dl
            FROM documents),
          g AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
            FROM d),
          t AS (
            SELECT doc_id, dl, w, CAST(count(*) AS DOUBLE) AS tf
            FROM (SELECT doc_id, dl, unnest(ws) AS w FROM d)
            WHERE w IN ('spark', 'merge', 'vector')
            GROUP BY doc_id, dl, w),
          f AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM t GROUP BY w),
          s AS (
            SELECT t.doc_id, t.w,
              ((g.n_docs - f.df + 0.5) / (f.df + 0.5)) *
                ((t.tf * (1.2 + 1.0)) /
                  (t.tf + 1.2 * ((1.0 - 0.75) + (0.75 * (t.dl / g.avgdl)))))
                AS sc
            FROM t JOIN f USING (w) CROSS JOIN g),
          p AS (
            SELECT doc_id,
              max(CASE WHEN w = 'spark' THEN sc END) AS s0,
              max(CASE WHEN w = 'merge' THEN sc END) AS s1,
              max(CASE WHEN w = 'vector' THEN sc END) AS s2
            FROM s GROUP BY doc_id),
          lexpool AS (
            SELECT doc_id,
              floor(((coalesce(s0, 0.0) + coalesce(s1, 0.0))
                + coalesce(s2, 0.0)) * 1000000.0) / 1000000.0 AS bm25
            FROM p ORDER BY bm25 DESC, doc_id LIMIT 100),
          lex AS (
            SELECT doc_id, CAST(ROW_NUMBER() OVER
              (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rank
            FROM lexpool),
          q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
          sempool AS (
            SELECT vec_id,
              round(
                list_sum(list_transform(list_zip(embedding, qv),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
                (sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
                 sqrt(list_sum(list_transform(qv,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos
            FROM embeddings CROSS JOIN q
            WHERE vec_id <> 0
            ORDER BY cos DESC, vec_id LIMIT 100),
          sem AS (
            SELECT vec_id AS doc_id, CAST(ROW_NUMBER() OVER
              (ORDER BY cos DESC, vec_id) AS BIGINT) AS sem_rank
            FROM sempool)
          SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
            lex_rank, sem_rank,
            CAST(coalesce(1000000000 // (60 + lex_rank), 0)
               + coalesce(1000000000 // (60 + sem_rank), 0) AS BIGINT) AS rrf
          FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
          ORDER BY rrf DESC, doc_id LIMIT 25""",
    // same cross-multiplied integer-ppm likelihood ratio, same BIGINT
    // divisions and top-k list — no floating point anywhere (DuckDB's
    // HUGEINT sums are cast back at the boundary)
    "q142_dsir_weight" ->
      s"""WITH w AS (
            SELECT doc_id,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
              unnest($wordsSql) AS w
            FROM documents),
          c AS (SELECT w, count(*) AS cr, sum(is_t) AS ct FROM w GROUP BY w),
          g AS (SELECT sum(cr) AS nr, sum(ct) AS nt, count(*) AS v FROM c),
          r AS (
            SELECT w,
              (ct + 1) * (nr + v) * 1000000 // ((cr + 1) * (nt + v)) AS r_ppm
            FROM c CROSS JOIN g),
          d AS (
            SELECT doc_id, count(*) AS n_words, sum(r_ppm) AS wsum
            FROM w JOIN r USING (w) GROUP BY doc_id),
          s AS (
            SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
              CAST(wsum // n_words AS BIGINT) AS dsir_ppm
            FROM d),
          t AS (SELECT doc_id FROM s ORDER BY dsir_ppm DESC, doc_id LIMIT 100)
          SELECT doc_id, n_words, dsir_ppm,
            CAST(CASE WHEN doc_id IN (SELECT doc_id FROM t)
              THEN 1 ELSE 0 END AS BIGINT) AS picked
          FROM s ORDER BY doc_id""")
}
