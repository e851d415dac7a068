package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis queries over the `documents` table (LLM-pipeline surface:
  * token counting, language ID, quality scoring, fingerprinting), each
  * oracle-checked against an identical DuckDB formulation.
  */
object TextQueries {

  /** Per-document structural stats. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_m"),
        tokenCountWs(col("text")).as("n_words"),
        round(length(col("text")).cast("double") /
          greatest(tokenCountWs(col("text")).cast("double"), lit(1.0)), 6)
          .as("chars_per_word"),
        round(punctRatio(col("text")), 6).as("punct_ratio"))
      .orderBy("doc_id")

  /** Heuristic language ID + agreement flag vs the labeled lang column. */
  def langIdQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        langId(col("text")).as("lang_pred"))
      .withColumn("agrees", (col("lang") === col("lang_pred")).cast("int"))
      .orderBy("doc_id")

  /** Composite quality score + keep/drop gate at 0.5. */
  def qualityQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        qualityScore(col("text")).as("quality"),
        (qualityScore(col("text")) >= 0.5).cast("int").as("keep"))
      .orderBy("doc_id")

  /** Whitespace + BPE-ish token counts (cost estimation surface). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        tokenCountWs(col("text")).as("n_ws_tokens"),
        tokenCountBpe(col("text")).as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Bag-of-words fingerprint + within-corpus fingerprint collision count
    * (shuffled-copy detection). */
  def fingerprintQuery(spark: SparkSession, dir: String): DataFrame =
    // ONE fp-keyed shuffle: the window count replaces groupBy + join-back,
    // which would recompute the md5 fingerprint on both join branches
    // (the q99 lesson applied back)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .withColumn("n_same_fp", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .select("doc_id", "fp", "n_same_fp")
      .orderBy("doc_id")

  /** Per-document exact-substring duplication gauge — the corpus-level
    * signal behind exact substring deduplication (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): a
    * document whose word 8-grams mostly recur elsewhere in the corpus is
    * boilerplate or a near-copy. Per doc: total 8-grams, how many have a
    * second occurrence ANYWHERE in the corpus (including within-doc — the
    * paper's corpus-level criterion), and that as integer ppm. Distinct
    * from q34 (MinHash estimates SET similarity; this detects exact
    * ORDERED spans) and q87 (whole-line matches).
    *
    * Scale shape: explode → two-phase gram count (map-side combine), then
    * a gram-keyed shuffle join back — corpus-sized on both sides, so no
    * broadcast hint (the q89 posture). All arithmetic is exact BIGINT
    * polynomial hashing → the oracle hashes identically. */
  def substringDup(spark: SparkSession, dir: String, k: Int = 8)
      : DataFrame = {
    // k-gram hashes via k-1 chained zips of shifted slices (the q49
    // trigram shape generalized): O(n·k) arithmetic with NO per-position
    // slice materialization — the indexed-lambda form (aggregate over
    // slice(hs, i, k) per position) allocates an array per gram and
    // measured 60× slower at sf0.1. Null tails from the slice padding
    // propagate through the arithmetic and are filtered, which also
    // handles docs shorter than k words (everything nulls out).
    // The word-hash array reaches the chain as a lambda ARGUMENT
    // (transform over a 1-element array): CollapseProject inlines a
    // multiply-referenced alias into every reference — 8 references would
    // re-run the per-word char fold 8× per row — but a lambda variable
    // binds once (the repo-wide HOF idiom).
    def kgramsOf(hs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      filter(
        (1 until k).foldLeft(hs) { (acc, j) =>
          zip_with(acc, slice(hs, lit(j + 1), size(hs)),
            (a, b) => (a * 131L + b) % 1000000007L)
        },
        x => x.isNotNull)
    // cheap-input/expensive-compute: a small landing file arrives as ONE
    // partition, which would serialize the hash chain on one core — spread
    // it first (at corpus scale the input already has ≥ cores partitions
    // and this is a no-op branch)
    val docs0 = Tables.load(spark, dir, "documents")
    val par = spark.sparkContext.defaultParallelism
    val docs = if (docs0.rdd.getNumPartitions < par)
      docs0.repartition(par) else docs0
    val grams = docs
      .select(col("doc_id"),
        get(transform(array(wordHashes(words(col("text")))),
          hs => kgramsOf(hs)), lit(0)).as("gs"))
      .select(col("doc_id"), explode(col("gs")).as("g"))
    // ONE gram-keyed shuffle: the window count replaces groupBy + join-back,
    // so the hash chain above is evaluated once, not once per join branch
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    grams.withColumn("n", count(lit(1)).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        expr("n_dup_grams * 1000000 DIV n_grams").as("dup_ppm"))
      .orderBy("doc_id")
  }

  /** q133: cross-document exact-substring STRIKE — the dedup action for
    * q99's signal (Lee et al. 2022, arXiv:2107.06499: removing duplicated
    * spans from the training corpus, keeping one canonical occurrence,
    * beats dropping whole near-dup documents). Every occurrence of a
    * k-word gram except the globally FIRST (ordered by doc_id, then
    * position — deterministic keep-earliest) is struck; a word is dropped
    * when ANY struck occurrence covers it; survivors reassemble in
    * original order (q87's in-order reassembly, at word granularity).
    * Output per document: word/struck counts + the cleaned text.
    *
    * Scale: one gram-keyed shuffle (the window computes occurrence count
    * AND first-occurrence in the same partitioning), a k-fan explode of
    * struck positions inside the stage, one doc-keyed aggregation whose
    * collect_list is bounded by document length. No joins against the
    * corpus beyond the anti-semantics LEFT JOIN on (doc, position); no
    * driver data paths. Suffix arrays (the paper's single-node tool)
    * don't shard; the gram-window form is how the same strike runs on
    * 1000 executors. */
  def spanStrike(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // q99's chained-zip gram hashes, positions retained (null tail from
    // the slice padding marks p > n-k and is filtered after posexplode)
    def kgramsOf(hs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (1 until k).foldLeft(hs) { (acc, j) =>
        zip_with(acc, slice(hs, lit(j + 1), size(hs)),
          (a, b) => (a * 131L + b) % 1000000007L)
      }
    val docs0 = Tables.load(spark, dir, "documents")
    val par = spark.sparkContext.defaultParallelism
    val docs = if (docs0.rdd.getNumPartitions < par)
      docs0.repartition(par) else docs0
    val ws = docs.select(col("doc_id"), words(col("text")).as("ws"))
    val grams = ws
      .select(col("doc_id"),
        posexplode(get(transform(array(wordHashes(col("ws"))),
          hs => kgramsOf(hs)), lit(0))).as(Seq("p", "g")))
      .filter(col("g").isNotNull)
    val w = Window.partitionBy(col("g"))
    val struck = grams
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("first", min(struct(col("doc_id"), col("p"))).over(w))
      .filter(col("n") > 1 &&
        !(col("doc_id") === col("first.doc_id") &&
          col("p") === col("first.p")))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (k - 1))).as("wpos"))
      .distinct()
    val wordsPos = ws.select(col("doc_id"),
      posexplode(col("ws")).as(Seq("wpos", "w")))
    wordsPos
      .join(struck.withColumn("s", lit(1)), Seq("doc_id", "wpos"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("s").isNotNull, 1L).otherwise(0L)).as("n_struck"),
        concat_ws(" ", transform(array_sort(collect_list(
          when(col("s").isNull, struct(col("wpos"), col("w"))))),
          p => p.getField("w"))).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Rolling-hash (winnowing-style) document fingerprint: min over rolling
    * word-trigram polynomial hashes + distinct-gram count — order-SENSITIVE
    * (catches near-identical edits), complementing q31's order-insensitive
    * bag-of-words md5. Exact integer arithmetic → oracle-checkable.
    * Two explicit projections keep the word-hash array materialized once
    * per row rather than re-deriving it per downstream reference. */
  def rollingFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), wordHashes(words(col("text"))).as("hs"))
      .select(col("doc_id"),
        when(size(col("hs")) >= 3,
          array_min(rollingTrigramHashes(col("hs"))))
          .otherwise(array_min(col("hs"))).as("fp_min"),
        when(size(col("hs")) >= 3,
          size(array_distinct(rollingTrigramHashes(col("hs")))).cast("long"))
          .otherwise(size(array_distinct(col("hs"))).cast("long"))
          .as("n_distinct_grams"))
      .orderBy("doc_id")

  /** Token-budget sequence packing (LLM training batch assembly): docs
    * stream into fixed 2048-token batches per language, batch id =
    * exclusive-prefix token sum div budget. One window sum over
    * (lang, doc order) — exact BIGINT arithmetic, single shuffle; at
    * 100 TB the same expression runs per partition-range with the batch
    * offset rebased, or as the streaming cumulative state. */
  def tokenPacking(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        tokenCountWs(col("text")).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("batch_id", floor(
        (col("cum_tokens") - col("n_tokens")).cast("double") / 2048.0)
        .cast("long"))
      .orderBy("lang", "doc_id")
  }

  /** Equi-depth split points for ordered-range bucketing: ≤ n−1 approx
    * percentiles of `c` (GK sketch, one pass, driver gets ≤ n−1
    * values). Duplicates collapse — a value heavier than a whole
    * bucket yields fewer, wider buckets, never an empty or broken
    * range. Longs round-trip through the sketch's doubles; above 2^53
    * a boundary may land off by a few ulps, which only moves WORK
    * between adjacent buckets (callers must be bound-agnostic). */
  private[graft] def equidepthSplits(df: DataFrame, c: String,
      n: Int): Array[Long] = {
    val probs = (1 until n).map(_.toDouble / n).toArray
    df.stat.approxQuantile(c, probs, 0.001)
      .map(math.round).distinct.sorted
  }

  /** Range-bucket id for sorted `splits`: bucket i holds
    * splits(i−1) ≤ v < splits(i) (bucket 0 below the first split, the
    * last bucket at/above the final one). A BINARY-SEARCH `when` tree
    * — depth ⌈log₂(#splits+1)⌉ codegen'd comparisons per row, not a
    * 256-way linear CASE and not an interpreted higher-order lambda
    * (the q152 lesson). */
  private[graft] def rangeBucket(c: org.apache.spark.sql.Column,
      splits: Array[Long]): org.apache.spark.sql.Column = {
    def go(lo: Int, hi: Int): org.apache.spark.sql.Column =
      if (lo == hi) lit(lo.toLong)
      else {
        val mid = (lo + hi) / 2
        when(c < lit(splits(mid)), go(lo, mid)).otherwise(go(mid + 1, hi))
      }
    go(0, splits.length)
  }

  /** q244: GLOBAL token-budget packing — q59's batch assembly WITHOUT
    * its per-language partition crutch. q59's window partitions by
    * `lang`, so each partition's prefix sum is an ordinary shuffle; a
    * single global training stream has no such key, and the naive
    * `Window.orderBy(doc_id)` with no partition collapses the corpus
    * onto ONE task — the anti-pattern this operator exists to replace
    * (its own scaladoc promised the rebased-offset form; this is it).
    *
    * Two-phase distributed prefix sum (the q240 order-statistics shape,
    * over ORDERED range buckets instead of hash buckets):
    *
    *   1. ≤256 EQUI-DEPTH doc_id-range buckets (approx-percentile
    *      bounds — the q221 discipline): a uniform (max−min)/256 split
    *      collapses clustered id spaces (timestamp-prefixed/snowflake
    *      ids, the norm at 100 TB) onto a few buckets and degenerates
    *      the within-bucket window back toward the one-task global
    *      sort this operator exists to kill; percentile bounds keep
    *      per-bucket row counts near-uniform WHATEVER the id
    *      distribution. One map-side-combined token sum per bucket —
    *      driver state is ≤256 rows, never corpus;
    *   2. the driver prefix-sums bucket totals into per-bucket OFFSETS
    *      (broadcast back — the rebase);
    *   3. each row's exclusive global prefix = bucket offset + within-
    *      bucket window sum; batch = prefix DIV budget, offset-in-batch
    *      = prefix MOD budget. Exact BIGINT arithmetic end to end.
    *
    * The decomposition is bound-AGNOSTIC — any ordered-range bucketing
    * yields the identical global prefix sum (bucket ids never appear
    * in the output) — so estimation error in the percentile sketch
    * can only skew WORK, never results. The DuckDB oracle replays the
    * plain global window — agreement proves the decomposition is
    * exactly the global prefix sum. */
  def globalPack(spark: SparkSession, dir: String,
      budget: Long = 2048L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCountWs(col("text"))
          .as("n_tokens"))
    val splits = equidepthSplits(base, "doc_id", 256)
    val bb = base.withColumn("bucket", rangeBucket(col("doc_id"), splits))
    // bounded collect: ≤ 256 (bucket, token-total) rows — metadata scale
    val sums = bb.groupBy("bucket").agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var off = 0L
    val offsets = sums.map { case (b, t) => val o = off; off += t; (b, o) }
    val offDf = broadcast(offsets.toSeq.toDF("bucket", "boff"))
    val wB = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bb.join(offDf, Seq("bucket"))
      .withColumn("cum_before",
        col("boff") + coalesce(sum(col("n_tokens")).over(wB), lit(0L)))
      .withColumn("batch_id", expr(s"cum_before DIV ${budget}L"))
      .withColumn("offset_in_batch", expr(s"cum_before % ${budget}L"))
      .select("doc_id", "n_tokens", "batch_id", "offset_in_batch")
      .orderBy("doc_id")
  }

  /** Hash-based stratified sampling: a row is kept iff the first 4 hex
    * digits of md5(id || '#' || seed) fall below floor(rate·65536) for its
    * stratum. Unlike engine-RNG `sampleBy`, membership is a pure function
    * of (id, seed) — deterministic across runs, engines, partitionings AND
    * cluster sizes (at 100 TB a re-run or a failed-stage retry samples the
    * SAME rows, and the DuckDB oracle can replay it exactly). Granularity
    * is 1/65536; strata absent from `rates` are dropped, like sampleBy. */
  def hashStratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], seed: String = "42"): DataFrame = {
    val h = substring(md5(concat(col(idCol).cast("string"), lit("#" + seed))), 1, 4)
    val keep = rates.foldLeft(lit(false)) { case (acc, (stratum, rate)) =>
      val cond =
        if (rate >= 1.0) lit(true)
        else h < lit(f"${math.max(math.floor(rate * 65536).toInt, 0)}%04x")
      when(col(strataCol) === stratum, cond).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Stratified sampling (per-language downsampling — the data-mixing
    * step of corpus curation), hash-based and therefore oracle-checkable. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    hashStratifiedSample(Tables.load(spark, dir, "documents"),
      "lang", "doc_id",
      Map("en" -> 0.25, "de" -> 1.0, "fr" -> 1.0, "es" -> 1.0, "zh" -> 0.5))
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** Gopher-style repetition signals (quality filtering for LLM corpora):
    * the fraction of a doc's word 2-grams taken by its MOST FREQUENT
    * 2-gram (template/boilerplate detector) and the duplicate-word
    * fraction (1 − distinct/total). Both as exact fractions floored at 1e-6
    * so the DuckDB oracle hashes identically.
    *
    * Scale shape: the top-gram computation is explode → two-phase count
    * (partial aggregation map-side) → per-doc max/sum — data-proportional,
    * no per-doc quadratic work; the word-duplication signal is a pure
    * Column expression on the tokenized array (evaluated once per row). */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val top = docs
      .select(col("doc_id"), explode(shingles2(col("text"))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("max_c"), sum(col("c")).as("n_g"))
      .select(col("doc_id"),
        (floor(col("max_c").cast("double") / col("n_g") * 1e6) / 1e6)
          .as("top2_frac"))
    val dupWords = docs.select(col("doc_id"),
      (floor((lit(1.0) -
        size(array_distinct(words(col("text")))).cast("double") /
          size(words(col("text")))) * 1e6) / 1e6).as("dup_word_frac"))
    top.join(dupWords, Seq("doc_id")).orderBy("doc_id")
  }

  // PII patterns: no lookarounds, so they mean the same thing to Java
  // regex (Spark) and RE2 (DuckDB).
  private[graft] val EmailRe =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\+[0-9][0-9-]{7,}"
  private[graft] val Ipv4Re =
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Innermost-first PII rewrite (email before IP so a dotted domain can't
    * be half-eaten by the IP rule) — shared by q76 and the corpus
    * pipeline's silver annotation. */
  private[graft] def redactPii(c: org.apache.spark.sql.Column) =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** PII detection + redaction (mandatory curation pass before text
    * becomes training data). The fixture corpus carries no PII, so — the
    * q75 pattern — deterministic PII is synthesized in-query from doc_id
    * (an email for every doc, a phone for every 3rd, an IP for every 5th),
    * then counted and redacted innermost-first (email before IP, so an
    * address's dotted domain can't be half-eaten by the IP rule). The
    * DuckDB oracle replays the same synthesis and the same regexes: a
    * redaction regression breaks the hash. Pure codegen'd string
    * expressions — at 100 TB this is a map-only pass, no shuffle. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val pii = concat(
      lit("contact user"), col("doc_id").cast("string"), lit("@example.com"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), ((col("doc_id") * 7) % 256).cast("string")))
        .otherwise(lit("")),
      lit(" "), col("text"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), pii.as("pii"))
      .select(col("doc_id"),
        regexp_count(col("pii"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("pii"), lit(PhoneRe)).cast("long").as("n_phones"),
        regexp_count(col("pii"), lit(Ipv4Re)).cast("long").as("n_ips"),
        substring(redactPii(col("pii")), 1, 64).as("redacted_head"))
      .orderBy("doc_id")
  }

  /** Per-document script mix (writing-system profile: Latin vs CJK vs
    * digits vs whitespace) — corpus-composition auditing for multilingual
    * training data. Counts are exact integers (no double hashing risk);
    * the Latin fraction uses the cross-engine floor idiom. The CJK class
    * demonstrates unicode-range counting (the fixture is Latin-only, so
    * the column is 0 there; TextOpsSpec proves the class on real CJK). */
  def scriptMix(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        regexp_count(col("text"), lit("[A-Za-z]")).cast("long").as("n_latin"),
        regexp_count(col("text"), lit("[0-9]")).cast("long").as("n_digit"),
        regexp_count(col("text"), lit(" ")).cast("long").as("n_space"),
        regexp_count(col("text"), lit("[一-鿿]")).cast("long")
          .as("n_cjk"),
        (floor(regexp_count(col("text"), lit("[A-Za-z]")).cast("double") /
          greatest(length(col("text")), lit(1)).cast("double") * 1e6) / 1e6)
          .as("latin_frac"))
      .withColumn("dominant",
        when(col("n_cjk") > col("n_latin"), lit("cjk"))
          .when(col("n_latin") > 0, lit("latin"))
          .otherwise(lit("other")))
      .orderBy("doc_id")

  /** Fixed-window document chunking with overlap (context-window prep:
    * pretraining corpora are consumed as W-token chunks, stride S < W so
    * no boundary context is lost). Chunk count is closed-form integer
    * arithmetic — `1 + ceil((n-W)/S)` for n > W — so the fan-out is a
    * codegen'd explode(sequence(...)), map-only, no shuffle; the last
    * chunk clamps at the document end (Spark `slice` and DuckDB list
    * slicing both clamp, so the engines agree). Offsets are emitted
    * 1-based so a consumer can address tokens without re-splitting. */
  def chunkDocuments(spark: SparkSession, dir: String,
      window: Int = 64, stride: Int = 48): DataFrame =
    chunkOf(Tables.load(spark, dir, "documents"), window, stride)

  /** [[chunkDocuments]] over an arbitrary (doc_id, text, ...) frame — the
    * seam [[graft.pipeline.CorpusPipeline]] chunks its curated corpus
    * through. */
  def chunkOf(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val nChunks = when(col("n_tokens") <= window, lit(1L))
      .otherwise(lit(1L) + floor(
        (col("n_tokens") - window + (stride - 1)).cast("double") / stride)
        .cast("long"))
    docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .withColumn("n_tokens", size(col("ws")).cast("long"))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("start_token", col("chunk_id") * stride + 1)
      .withColumn("chunk",
        slice(col("ws"), col("start_token").cast("int"), lit(window)))
      .select(col("doc_id"), col("chunk_id"), col("start_token"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Unicode normalization + whitespace/control cleanup (the first pass
    * of every curation pipeline; [[graft.functions.TextNormalize]]). The
    * fixture text is clean ASCII, so — the q76 pattern — mess is
    * synthesized in-query: a DECOMPOSED accent (combining mark chosen by
    * doc_id), a tab run and a control byte are spliced in; both engines
    * then normalize with their own NFC implementation (JDK Normalizer vs
    * DuckDB's) and the same RE2/Java-compatible regexes. Byte-identical
    * output proves the native `nfc_normalize` expression against an
    * independent Unicode implementation, not against itself. */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextNormalize
    val suffix = when(col("doc_id") % 3 === 0, lit("cafe\u0301")) // e + acute
      .when(col("doc_id") % 3 === 1, lit("A\u030A"))              // ring above
      .otherwise(lit("o\u0308"))                                  // diaeresis
    val raw = concat(lit("x \t "), suffix,
      lit(" \u0001 "), col("text")) // tab run, control byte
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("n_raw"),
        length(TextNormalize.nfc(col("raw"))).cast("long").as("n_nfc"),
        length(TextNormalize.cleanText(col("raw"))).cast("long").as("n_clean"),
        substring(TextNormalize.cleanText(col("raw")), 1, 48).as("clean_head"))
      .orderBy("doc_id")
  }

  /** Adjacent character-pair frequencies over the corpus vocabulary — the
    * counting step a BPE tokenizer trainer iterates (highest-count pair
    * merges, recount, repeat). One distributed pass: explode words, guard
    * length >= 2 (Spark's `sequence` REVERSES when start > stop — an
    * unguarded 1-char word would emit phantom pairs), explode the in-word
    * bigrams, hash-aggregate. Map-side combine does the heavy lifting: at
    * 100 TB the shuffle carries ~|alphabet|^2 partial counts per task,
    * not the corpus. */
  def bpePairCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(explode(words(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("pair"))

  /** Deterministic train/val/test assignment (90/5/5): the q58 md5
    * membership function on doc_id, thresholds at floor(0.90·65536)=0xe666
    * and floor(0.95·65536)=0xf333. A pure function of the id — the same
    * doc lands in the same split on any engine, cluster size, or re-run
    * (eval-set leakage from a reshuffled re-split is a real corpus bug
    * this construction makes impossible), and membership is reproducible
    * from the id alone without storing an assignment table. */
  def trainValTestSplit(spark: SparkSession, dir: String): DataFrame = {
    val h = substring(
      md5(concat(col("doc_id").cast("string"), lit("#split42"))), 1, 4)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        when(h < lit("e666"), lit("train"))
          .when(h < lit("f333"), lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy("doc_id")
  }

  /** Deterministic seeded global shuffle into training shards — the
    * write-side step after curation (reference stops at gold tables; a
    * training pipeline must still lay the corpus out in a reproducible
    * random order). Every doc gets a shard (value of the first hex digit
    * of a seeded md5 — uniform over 16) and a position within its shard
    * (rank over the REMAINING hex digits — independent bits of the same
    * hash, distinct because the ids are), so the full training order is a
    * pure function of (seed, doc_id): any engine, cluster size, or re-run
    * reproduces it exactly, and resharding is a seed bump, not a state
    * migration. Scale: one hash exchange on shard + per-shard sort — the
    * physical write ([[writeShards]]) never global-sorts the corpus, and
    * per-shard sort size is bounded by TAKING MORE DIGITS: `hexDigits`
    * = d gives 16^d shards (d=3 → 4096 shards ≈ 25 GB/shard at 100 TB),
    * so the in-shard rank stays a spillable single-task sort at any
    * corpus size. q122 pins d=1 (16 shards) for the oracle. */
  def shardShuffle(spark: SparkSession, dir: String,
      hexDigits: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(hexDigits >= 1 && hexDigits <= 8, "1..8 hex digits (16^d shards)")
    val shardExpr = (1 to hexDigits).map(i =>
      s"(CAST(instr('0123456789abcdef', substring(h, $i, 1)) - 1" +
        " AS BIGINT))").reduce((a, b) => s"($a * 16 + $b)")
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit("#shard42"))).as("h"))
      .select(col("doc_id"),
        expr(shardExpr).as("shard"),
        expr(s"substring(h, ${hexDigits + 1})").as("ord"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy("shard").orderBy("ord")).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  /** q240: deterministic MID-EPOCH RESUME — the skip-to-step read an
    * interrupted training run needs: rows [step, step+n) of the seeded
    * global training order (order key = (md5(doc_id||seed), doc_id) —
    * q122's order flattened across shards), computed EXACTLY with no
    * global sort anywhere. Two-phase distributed order statistics:
    *
    *   1. one map-side-combined count per 256 hash-prefix bucket —
    *      driver state bounded at 256 rows (the q221 equi-depth
    *      boundary pattern);
    *   2. the driver prefix-sums bucket counts and keeps only the
    *      buckets OVERLAPPING the window — ≤ 2 + n/mean_bucket, so the
    *      second scan reads ~n rows however big the corpus is;
    *   3. rank = bucket offset + row_number within the bucket
    *      (per-bucket window over the pruned slice — never a global or
    *      single-partition sort), filtered to [step, step+n).
    *
    * The DuckDB oracle replays it as the plain global ROW_NUMBER —
    * agreement proves the order-statistics decomposition, and the
    * windowed-slice consistency is pinned in TextOpsSpec. */
  def resumeAt(spark: SparkSession, dir: String, step: Long = 100L,
      n: Long = 20L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    def hexVal(i: Int) =
      s"CAST(instr('0123456789abcdef', substring(h, $i, 1)) - 1 AS BIGINT)"
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit("#shard42"))).as("h"))
      .withColumn("bucket", expr(s"${hexVal(1)} * 16 + ${hexVal(2)}"))
    val counts = base.groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var off = 0L
    val offsets = counts.map { case (b, c) =>
      val o = off; off += c; (b, o, c) }
    val wanted = offsets
      .filter { case (_, o, c) => o < step + n && o + c > step }
    val offDf = broadcast(wanted.map { case (b, o, _) => (b, o) }
      .toSeq.toDF("bucket", "off"))
    val wB = Window.partitionBy(col("bucket"))
      .orderBy(col("h"), col("doc_id"))
    base.join(offDf, Seq("bucket"))
      .withColumn("rank",
        col("off") + row_number().over(wB).cast("long") - 1)
      .filter(col("rank") >= step && col("rank") < step + n)
      .select(col("rank"), col("doc_id"))
      .orderBy("rank")
  }

  /** Materialize the q122 layout: one exchange hash-partitioned on shard,
    * rows sorted (shard, pos) WITHIN partitions, written partitioned by
    * shard — each shard directory holds its slice already in training
    * order, with no global sort anywhere in the plan. */
  def writeShards(spark: SparkSession, dir: String, out: String,
      hexDigits: Int = 1): Unit =
    shardShuffle(spark, dir, hexDigits)
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(out)

  /** Power-of-two length bucketing with padding-waste accounting — the
    * pre-batching step that groups sequences of similar length so each
    * pads only to the next power of two instead of the global max
    * (padding efficiency is a first-order training-throughput lever).
    * One codegen'd map pass + one tiny aggregate (≤ log2(maxlen)
    * groups); the waste ratio is exact-integer arithmetic divided once,
    * so it is bit-stable across engines. */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    Tables.load(spark, dir, "documents")
      .withColumn("n_tokens",
        graft.functions.TextFunctions.tokenCountWs(col("text")))
      .withColumn("bucket",
        pow(lit(2.0), ceil(log2(col("n_tokens")))).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("bucket") - col("n_tokens")).as("pad_waste"))
      .withColumn("waste_ratio",
        (col("pad_waste").cast("double") /
          (col("n_docs") * col("bucket")).cast("double"))
          .cast(DecimalType(18, 6)).cast("double"))
      .orderBy("bucket")
  }

  /** The full Gopher rule set (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", Appendix A.1.1)
    * — the canonical heuristic quality gate for web-crawl corpora, which
    * the composite q29 score approximates with three signals. Per doc:
    * every rule's measurement plus the conjunctive keep flag:
    * word count in [50, 100000]; mean word length in [3, 10]; symbol
    * (`#` / `...`) to word ratio ≤ 0.1; < 90% of lines bullet-led;
    * < 30% of lines ellipsis-terminated; ≥ 80% of words with an
    * alphabetic character; ≥ 2 distinct Gopher stopwords (the, be, to,
    * of, and, that, have, with).
    *
    * The fixture corpus is single-line, so — the q87/q76 pattern —
    * line structure is synthesized in-query (a bullet lead-in on ids
    * ≡ 0 mod 3, a "read more..." trailer on ids ≡ 0 mod 4) and the
    * oracle replays the same synthesis. All ratios are exact-integer
    * ppm (`(1e6 * num) div den` on BIGINTs) so both engines hash
    * identically — the double-domain thresholds the paper states are
    * equivalent at ppm precision.
    *
    * Scale: one codegen'd map pass over the corpus, no shuffle but the
    * final presentation sort; at 100 TB this is the cheapest possible
    * full-scan shape (the gate runs BEFORE dedup/mixing so everything
    * downstream sees fewer rows). */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val raw = concat(
      when(col("doc_id") % 3 === 0, lit("- overview\n")).otherwise(lit("")),
      col("text"),
      when(col("doc_id") % 4 === 0, lit("\nread more...")).otherwise(lit("")))
    val stoplist = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), raw.as("raw"))
      .withColumn("ls", split(col("raw"), "\n"))
      .withColumn("ws", words(col("raw")))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_lines", size(col("ls")).cast("long"))
      .withColumn("word_chars", aggregate(col("ws"), lit(0L),
        (acc, w) => acc + length(w)))
      .withColumn("n_sym",
        (length(col("raw")) - length(regexp_replace(col("raw"), "#", "")) +
          (length(col("raw")) -
            length(regexp_replace(col("raw"), "\\.\\.\\.", ""))) / 3)
          .cast("long"))
      .withColumn("n_bullet", size(filter(col("ls"),
        l => substring(trim(l), 1, 1).isin("-", "*"))).cast("long"))
      .withColumn("n_ellipsis", size(filter(col("ls"),
        l => substring(l, -3, 3) === "...")).cast("long"))
      .withColumn("n_alpha", size(filter(col("ws"),
        w => w.rlike("[a-z]"))).cast("long"))
      .withColumn("stop_hits",
        size(array_intersect(col("ws"),
          typedLit(stoplist))).cast("long"))
      .withColumn("mean_len_ppm", expr("(1000000 * word_chars) div n_words"))
      .withColumn("sym_ppm", expr("(1000000 * n_sym) div n_words"))
      .withColumn("bullet_ppm", expr("(1000000 * n_bullet) div n_lines"))
      .withColumn("ellipsis_ppm", expr("(1000000 * n_ellipsis) div n_lines"))
      .withColumn("alpha_ppm", expr("(1000000 * n_alpha) div n_words"))
      .withColumn("keep",
        (col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_len_ppm") >= 3000000L && col("mean_len_ppm") <= 10000000L &&
          col("sym_ppm") <= 100000L &&
          col("bullet_ppm") < 900000L &&
          col("ellipsis_ppm") < 300000L &&
          col("alpha_ppm") >= 800000L &&
          col("stop_hits") >= 2).cast("int"))
      .select("doc_id", "n_words", "mean_len_ppm", "sym_ppm", "bullet_ppm",
        "ellipsis_ppm", "alpha_ppm", "stop_hits", "keep")
      .orderBy("doc_id")
  }

  /** q226: quality-filter ABLATION matrix — the design table read before
    * fixing a filter stack: for every pair of candidate filters, how many
    * docs each keeps and how much their keep-sets overlap (exact Jaccard,
    * integer ppm). Two filters with overlap ≈ 1 are redundant (keep the
    * cheaper); overlap ≈ independence means both earn their place. Real
    * curation pipelines (FineWeb's ablation studies, Gopher App. A) run
    * exactly this audit because every extra filter is a full corpus scan.
    *
    * Four representative filters, all integer-exact so both engines hash
    * identically: length band (n_chars in [200, 2000]), word count
    * (≥ 20), Gopher stopword evidence (≥ 2 distinct hits), alphabetic
    * word ratio (≥ 80% in ppm).
    *
    * Scale shape: ONE codegen'd map pass computes all four flags, one
    * global aggregate folds the 4 keep counts and 6 pairwise
    * intersections (map-side combine, 1 row out), and the 6-row matrix is
    * a driver-free reshape of that row. At 100 TB this is the minimal
    * possible cost for the table: one scan, no shuffle, no joins. */
  def filterAblation(spark: SparkSession, dir: String): DataFrame = {
    val stoplist = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val flagged = Tables.load(spark, dir, "documents")
      .withColumn("ws", words(col("text")))
      .withColumn("f_len",
        (col("n_chars") >= 200 && col("n_chars") <= 2000).cast("long"))
      .withColumn("f_words", (size(col("ws")) >= 20).cast("long"))
      .withColumn("f_stop",
        (size(array_intersect(col("ws"), typedLit(stoplist))) >= 2)
          .cast("long"))
      .withColumn("f_alpha",
        (expr("1000000 * size(filter(ws, w -> w rlike '[a-z]')) " +
          "DIV size(ws)") >= 800000L).cast("long"))
    val names = Seq("f_len", "f_words", "f_stop", "f_alpha")
    val pairs = for {
      i <- names.indices; j <- (i + 1) until names.size
    } yield (names(i), names(j))
    val aggs = names.map(n => sum(col(n)).as(s"n_$n")) ++
      pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"n_${a}_$b") }
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(pairs.map { case (a, b) =>
      struct(lit(a).as("filter_a"), lit(b).as("filter_b"),
        col(s"n_$a").as("n_a"), col(s"n_$b").as("n_b"),
        col(s"n_${a}_$b").as("n_both"),
        // union can be 0 only when both filters keep nothing — define
        // that as 0 overlap rather than a divide-by-zero
        expr(s"CASE WHEN n_$a + n_$b - n_${a}_$b = 0 THEN CAST(0 AS BIGINT) " +
          s"ELSE 1000000 * n_${a}_$b DIV (n_$a + n_$b - n_${a}_$b) END")
          .as("overlap_ppm"))
    }: _*)).as("r"))
      .select("r.*")
      .orderBy("filter_a", "filter_b")
  }

  /** HTML main-content extraction — the crawl→text stage every web-scale
    * corpus starts with (trafilatura/jusText shape: keep block-level text
    * nodes, drop chrome and link-dense blocks). The fixture stores plain
    * text, so the query synthesizes the HTML it would have arrived in
    * (the q144 in-query synthesis precedent): nav/footer chrome outside
    * the content blocks, one line per `<p>`, and a link-bait paragraph
    * injected into every 5th document. Extraction = pull `<p>` blocks
    * (non-greedy regex — Java and RE2 agree), drop link-dense ones
    * (contains `<a `), join, and fingerprint. Integer retained-ratio in
    * ppm; md5 text hash compares content exactly.
    *
    * Scale shape: a single codegen'd projection — synthesis, regex
    * extraction, filter, and hash per row; no shuffle but the
    * presentation sort. */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val ad = """<p><a href="/ad">Click here</a> to subscribe</p>"""
    val html = concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title></head><body><nav><a href=\"/\">Home</a> | " +
        "<a href=\"/about\">About</a></nav>"),
      when(col("doc_id") % 5 === 0, lit(ad)).otherwise(lit("")),
      lit("<p>"), regexp_replace(col("text"), "\n", "</p><p>"), lit("</p>"),
      lit("<footer>(c) 2026 Example Corp - " +
        "<a href=\"/tos\">Terms</a></footer></body></html>"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), html.as("html"))
      .withColumn("paras", expr("regexp_extract_all(html, '<p>(.*?)</p>', 1)"))
      .withColumn("kept", filter(col("paras"),
        p => !p.contains("<a ")))
      .withColumn("joined", concat_ws(" ", col("kept")))
      .select(col("doc_id"),
        size(col("paras")).cast("long").as("n_paras"),
        size(col("kept")).cast("long").as("n_kept"),
        expr("(1000000 * length(joined)) DIV length(html)")
          .as("retained_ppm"),
        md5(col("joined")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** Weighted priority sampling (Duffield, Lund & Thorup 2007): each item
    * gets priority `w / u` with u ~ U(0,1); the k largest priorities form
    * a sample whose Horvitz–Thompson estimates are unbiased for ANY
    * weighted sum — the principled way to keep a small audit slice of a
    * 100 TB corpus where long documents matter more. Weight = n_chars;
    * u is the doc's seeded 16-bit md5 slot (the q58/q77 determinism
    * pattern), priority the exact integer `(w·65536) DIV (u+1)`.
    *
    * Scale shape: one codegen'd map pass; the k winners come from a
    * global `ORDER BY LIMIT k` (TakeOrderedAndProject — per-partition
    * heaps, no global sort). */
  def prioritySample(spark: SparkSession, dir: String, k: Int = 50)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("w"),
        (conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("#pri42"))), 1, 4), 16, 10).cast("long")).as("u16"))
      .withColumn("priority", expr("(w * 65536) DIV (u16 + 1)"))
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("priority").desc, col("doc_id").asc))
        .cast("long"))
      .select("rank", "doc_id", "w", "u16", "priority")
      .orderBy("rank")
  }

  /** Inverse-cloze positive-pair mining (Lee et al. 2019, "Latent
    * Retrieval for Weakly Supervised Open Domain Question Answering"
    * §3.ted as ICT): from each document, one line becomes the pseudo-query
    * and the REMAINING lines its positive context — the (query, positive)
    * pairs a dual-encoder pretrains on, and q152's hard negatives are
    * the matching third leg of the triplet. The held-out line is a
    * seeded-md5 pick (the q58/q77 determinism pattern); outputs carry
    * md5 fingerprints of both sides so the pairing is hash-checkable
    * without shipping the text twice.
    *
    * Scale shape: one codegen'd projection per document (split, pick,
    * filter-by-index, join, hash) — zero shuffles beyond the
    * presentation sort. */
  def ictPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), "\n").as("ls"))
      .withColumn("n_lines", size(col("ls")).cast("long"))
      .withColumn("q_idx",
        pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("#ict42"))), 1, 15), 16, 10).cast("long"), col("n_lines")))
      .withColumn("query_md5",
        md5(element_at(col("ls"), (col("q_idx") + 1).cast("int"))))
      .withColumn("context_md5", md5(concat_ws(" ",
        filter(col("ls"), (_, i) => i =!= col("q_idx")))))
      .select("doc_id", "n_lines", "q_idx", "query_md5", "context_md5")
      .orderBy("doc_id")

  /** Per-source dataset-card dashboard — the one-pass summary table a
    * corpus release ships (HuggingFace dataset-card shape): per
    * (source, lang) the document count, token volume, mean length, mean
    * quality (q29's exact-ppm score, integer-averaged so the mean is
    * order-free), and the exact-duplicate share. Every metric is BIGINT.
    *
    * Scale shape: one corpus-wide window on the text fingerprint (the
    * q31 shuffle) feeding one map-side-combined (source, lang) hash-agg
    * — bounded output, no joins. */
  def sourceDashboard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.load(spark, dir, "documents")
      .withColumn("n_same", count(lit(1)).over(
        Window.partitionBy(md5(col("text")))))
      .withColumn("q_ppm",
        floor(qualityScore(col("text")) * 1e6).cast("long"))
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCountWs(col("text"))).as("total_tokens"),
        expr("sum(length(text)) DIV count(1)").as("mean_chars"),
        expr("sum(q_ppm) DIV count(1)").as("mean_quality_ppm"),
        expr("(1000000 * sum(CASE WHEN n_same > 1 THEN 1 ELSE 0 END)) " +
          "DIV count(1)").as("dup_ppm"))
      .orderBy("source", "lang")
  }

  /** Deterministic span corruption — the T5 denoising objective's data
    * prep (Raffel et al. 2020 §3.1.4): mask ~15% of tokens in length-3
    * spans, replace each masked span with a sentinel, and emit the
    * (corrupted input, span targets) pair. Spans are whole 3-token
    * blocks gated on a per-(doc, block) seeded 16-bit md5 slot
    * (threshold floor(0.15·65536)=9830 — the q58/q77 membership
    * pattern); sentinels are position-indexed `<extra_id_b>` (block
    * index rather than T5's running counter: same information, no
    * cross-block scan). Outputs fingerprint both sides so the pair is
    * hash-checkable without shipping the text twice.
    *
    * Scale shape: one codegen'd projection per document — the block
    * loop is a per-row array transform, no shuffle but the
    * presentation sort. */
  def spanCorrupt(spark: SparkSession, dir: String): DataFrame = {
    def blockMasked(b: Column): Column =
      conv(substring(md5(concat(col("doc_id").cast("string"),
        lit("#sc42#"), b.cast("string"))), 1, 4), 16, 10)
        .cast("long") < 9830L
    def sentinel(b: Column): Column =
      concat(lit("<extra_id_"), b.cast("string"), lit(">"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), words(col("text")).as("ws"))
      .withColumn("n_tokens", size(col("ws")).cast("long"))
      .withColumn("blocks",
        expr("sequence(CAST(0 AS BIGINT), (n_tokens + 2) DIV 3 - 1)"))
      .select(col("doc_id"), col("n_tokens"),
        size(filter(col("blocks"), b => blockMasked(b))).cast("long")
          .as("n_masked"),
        md5(concat_ws(" ", flatten(transform(col("blocks"), b =>
          when(blockMasked(b), array(sentinel(b)))
            .otherwise(slice(col("ws"), (b * 3 + 1).cast("int"),
              lit(3))))))).as("corrupted_md5"),
        md5(concat_ws(" ", flatten(transform(col("blocks"), b =>
          when(blockMasked(b), concat(array(sentinel(b)),
            slice(col("ws"), (b * 3 + 1).cast("int"), lit(3))))
            .otherwise(array().cast("array<string>"))))))
          .as("targets_md5"))
      .orderBy("doc_id")
  }

  /** First-occurrence n-gram novelty — the freshness signal a rolling
    * crawl uses to rank candidate documents (and a curriculum orderer
    * uses in reverse): per document, the share of its DISTINCT word
    * 8-grams whose first corpus occurrence (min doc_id = ingestion
    * order) is this document. q99 measures how much of a doc recurs
    * ANYWHERE (symmetric duplication); this measures how much is NEW
    * relative to everything before it (directional). Same polynomial
    * gram hashing, exact BIGINT ppm.
    *
    * Scale shape: q99's exactly — one gram-keyed shuffle whose window
    * computes the first occurrence, then one doc-keyed aggregation; the
    * hash chain is evaluated once. Docs shorter than k words carry no
    * grams and no row (the q99 convention). */
  def noveltyScore(spark: SparkSession, dir: String, k: Int = 8)
      : DataFrame = {
    def kgramsOf(hs: Column): Column =
      filter(
        (1 until k).foldLeft(hs) { (acc, j) =>
          zip_with(acc, slice(hs, lit(j + 1), size(hs)),
            (a, b) => (a * 131L + b) % 1000000007L)
        },
        x => x.isNotNull)
    val docs0 = Tables.load(spark, dir, "documents")
    val par = spark.sparkContext.defaultParallelism
    val docs = if (docs0.rdd.getNumPartitions < par)
      docs0.repartition(par) else docs0
    val grams = docs
      .select(col("doc_id"),
        explode(array_distinct(get(transform(
          array(wordHashes(words(col("text")))),
          hs => kgramsOf(hs)), lit(0)))).as("g"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    grams.withColumn("first_doc", min(col("doc_id")).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("n_novel * 1000000 DIV n_grams").as("novelty_ppm"))
      .orderBy("doc_id")
  }

  /** Leakage-free train/val/test split — q90 splits per DOCUMENT, which
    * lets two copies of the same text land in train AND test (the
    * benchmark-contamination failure decontamination later has to
    * catch); this splits per DUPLICATE GROUP: every doc shares its
    * group's representative (min doc_id over the exact-text group), and
    * the split decision hashes the REPRESENTATIVE — so identical texts
    * travel together by construction. Same 90/95 seeded-md5 thresholds
    * as q90 (floor(0.90·65536)=0xe666, floor(0.95·65536)=0xf333),
    * applied to the rep id.
    *
    * Scale shape: one text-fingerprint window (the q31 shuffle) and a
    * codegen'd projection — no joins. The same pattern extends to
    * NEAR-dup groups by substituting q57's cluster representative. */
  def leakFreeSplit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.load(spark, dir, "documents")
      .withColumn("rep_id", min(col("doc_id")).over(
        Window.partitionBy(md5(col("text")))))
      .withColumn("slot", substring(
        md5(concat(col("rep_id").cast("string"), lit("#split42"))), 1, 4))
      .select(col("doc_id"), col("rep_id"),
        when(col("slot") < "e666", "train")
          .when(col("slot") < "f333", "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** Content-defined chunking (the rsync/FastCDC recipe on text): a chunk
    * boundary falls after every position whose 8-char rolling hash ≡ 0
    * (mod 32) — so chunk boundaries move WITH the content, and an insert
    * near the front re-chunks only its neighborhood instead of shifting
    * every fixed-window boundary (the failure mode of q79's fixed
    * chunking for dedup purposes). Per document: chunk count, distinct
    * chunk fingerprints, and the share of its chunks that also occur in
    * ANOTHER document — the dedupable-bytes signal object stores and
    * crawl dedupers act on.
    *
    * Scale shape: chunking is one projection (per-char fold, no
    * shuffle); the only shuffle is fingerprint-keyed on DISTINCT
    * (doc, fp) pairs, where the q31 window-count trick replaces
    * groupBy + join-back. Docs with empty text carry no row (the q163
    * convention). */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the per-codepoint rolling-hash scan is the native CdcChunksExpr
    // hot loop (the zip_with-chain formulation of the same cuts measured
    // 32 s at sf0.1 — interpreted lambda per character; the compiled
    // expression runs it in ~1 s); per-CHUNK work stays in built-ins
    val base = Tables.load(spark, dir, "documents")
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"),
        graft.functions.CdcChunksExpr.cdcChunks(col("text")).as("chunks"))
      .select(col("doc_id"),
        size(col("chunks")).cast("long").as("n_chunks"),
        array_distinct(transform(col("chunks"), c => md5(c))).as("fps"))
      .withColumn("n_distinct_chunks", size(col("fps")).cast("long"))
    val w = Window.partitionBy("fp")
    base.select(col("doc_id"), col("n_chunks"), col("n_distinct_chunks"),
        explode(col("fps")).as("fp"))
      .withColumn("nd", count(lit(1)).over(w))
      .groupBy("doc_id")
      .agg(max("n_chunks").as("n_chunks"),
        max("n_distinct_chunks").as("n_distinct_chunks"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared_chunks"))
      .withColumn("dup_ppm",
        expr("n_shared_chunks * 1000000 DIV n_distinct_chunks"))
      .orderBy("doc_id")
  }

  /** Tokenizer fertility per language: BPE-proxy tokens per whitespace
    * word (the tokenizer-evaluation metric that exposes how much a vocab
    * penalizes a script — high fertility = more compute per word). One
    * bounded hash-agg, exact integer ppm. */
  def fertility(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCountWs(col("text"))).as("ws_tokens"),
        sum(tokenCountBpe(col("text"))).as("bpe_tokens"))
      .withColumn("fertility_ppm",
        expr("bpe_tokens * 1000000 DIV ws_tokens"))
      .orderBy("lang")

  /** q209: sequence-length policy sweep — the pad/truncate waste table
    * read before fixing a training max_len: for each candidate length,
    * exactly how many tokens a pad-to-L policy burns as padding, how
    * many a truncate-at-L policy destroys, and the resulting slot
    * utilization in ppm. q59 packs greedily once a length is CHOSEN;
    * this is the sweep that chooses it.
    *
    * Scale shape: one scan, a 4-way candidate explode (constant), one
    * map-side-combinable groupBy — O(candidates) output rows. */
  def paddingSweep(spark: SparkSession, dir: String,
      lengths: Seq[Int] = Seq(128, 256, 512, 1024)): DataFrame = {
    Tables.load(spark, dir, "documents")
      .select(expr("n_chars DIV 4").as("tok"))
      .withColumn("max_len",
        explode(array(lengths.map(l => lit(l.toLong)): _*)))
      .groupBy("max_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("total_tokens"),
        sum(least(col("tok"), col("max_len"))).as("kept_tokens"),
        sum(col("max_len") - least(col("tok"), col("max_len")))
          .as("pad_tokens"),
        sum(greatest(lit(0L), col("tok") - col("max_len")))
          .as("trunc_tokens"))
      .withColumn("util_ppm",
        expr("1000000 * kept_tokens DIV (n_docs * max_len)"))
      .orderBy("max_len")
  }

  /** q211: URL/domain blocklist filtering with PARENT-domain semantics —
    * the UT1/adult-blocklist gate every web-corpus pipeline runs first
    * (RefinedWeb §3.1, FineWeb): a host is blocked when the list names
    * the host itself OR any parent domain. Suffix matching is a
    * non-equi predicate, so the Spark-first lowering explodes each host
    * into its (bounded-depth) suffix chain and equi-joins the list —
    * candidate volume is docs × depth (≤4 here), never docs × rules.
    * When several rules match, the MOST SPECIFIC (longest) wins — the
    * standard precedence so an allow-over-ride can be layered later.
    * Hosts are synthesized deterministically from (doc_id, source); the
    * rule table is a bounded config literal, broadcast by construction.
    *
    * Scale shape: one scan, a constant-width explode, a broadcast
    * equi-join against the rule table, one per-doc max-length argmax —
    * no shuffle keyed on anything data-sized but doc_id. */
  def domainBlocklist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rules = Seq(
      "src3.example.com",      // blocks a whole source's domain
      "src1.example.com",      // a parent rule the host rule overlaps…
      "h7.src1.example.com",   // …so longest-rule precedence is REAL
      "h11.src0.example.com",  // blocks one specific host
      "badtld.net"             // matches nothing in the fixture
    ).toDF("rule")
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        concat(lit("h"), col("doc_id") % 13, lit("."), col("source"),
          lit(".example.com")).as("host"))
    val suffixes = docs.select(col("doc_id"), col("host"),
      explode(array(
        col("host"),
        concat(col("source"), lit(".example.com")),
        lit("example.com"),
        lit("com"))).as("suffix"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(length(col("rule")).desc, col("rule").asc)
    suffixes.join(broadcast(rules), col("suffix") === col("rule"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("host"), col("rule").as("blocked_by"))
      .orderBy("doc_id")
  }

  /** q213: dump-over-dump novelty — the crawl-freshness trend table a
    * CommonCrawl-style pipeline reads before deciding whether another
    * dump is worth processing (dumps are ~50% duplicate of their
    * predecessors; the marginal-new-content curve decides the crawl
    * budget). Documents are assigned to successive dumps
    * deterministically (`doc_id % 4` stands in for the dump id a real
    * corpus carries); a text hash is NEW in the first dump where it
    * appears. Per dump: total docs, distinct hashes, new hashes, new
    * tokens, and the novelty rate in ppm.
    *
    * Scale shape: one hash-keyed aggregate finds each hash's first dump
    * and per-(dump, hash) sizes (two-phase, map-side combined), one
    * per-dump rollup on top — no joins, no windows, O(dumps) output. */
  def dumpNovelty(spark: SparkSession, dir: String, nDumps: Int = 4)
      : DataFrame = {
    val perHash = Tables.load(spark, dir, "documents")
      .select((col("doc_id") % nDumps).as("dump"),
        md5(col("text")).as("h"), tokenCountWs(col("text")).as("tok"))
      .groupBy("dump", "h")
      .agg(count(lit(1)).as("n_docs"), max(col("tok")).as("tok1"))
    val firstDump = perHash.groupBy("h")
      .agg(min(col("dump")).as("first_dump"))
    perHash.join(firstDump, Seq("h"))
      .groupBy("dump")
      .agg(sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_hashes"),
        sum(when(col("dump") === col("first_dump"), 1L).otherwise(0L))
          .as("n_new_hashes"),
        sum(when(col("dump") === col("first_dump"), col("tok1"))
          .otherwise(0L)).as("new_tokens"))
      .withColumn("novelty_ppm",
        expr("1000000 * n_new_hashes DIV n_hashes"))
      .orderBy("dump")
  }

  /** q221: equi-depth length histogram — the order-statistic sibling of
    * q91's fixed-width bins and the stats table skew-aware planning
    * reads (equi-depth boundaries are what a CBO keeps, what q59's
    * packing uses to size length-stratified batches, and what a range
    * partitioner samples for): B buckets holding ~N/B documents each,
    * heavy length values allowed to overfill their bucket (real
    * equi-depth semantics under ties). A value's bucket is
    * B·cum_before DIV N over the cumulative count STRICTLY before it —
    * exact integers, no percentile estimation.
    *
    * Scale shape: one groupBy(value) aggregate reduces the corpus to
    * its distinct lengths; the cumulative window is single-partition
    * but runs over DISTINCT VALUES — bounded by the max document
    * length, O(distinct) « O(corpus) even at 100 TB (the q34 vocab
    * window precedent; a near-unique-valued column would instead go
    * through repartitionByRange sampling). */
  def equidepthLengths(spark: SparkSession, dir: String, buckets: Int = 8)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vc = Tables.load(spark, dir, "documents")
      .groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val tot = vc.agg(sum(col("c")).as("n_total"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    vc.withColumn("cum_before", coalesce(sum(col("c")).over(w), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("bucket", least(lit(buckets - 1L),
        expr(s"$buckets * cum_before DIV n_total")))
      .groupBy("bucket")
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("c")).as("n_docs"))
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q221_equidepth_hist" ->
      ((s: SparkSession, d: String) => equidepthLengths(s, d)),
    "q211_domain_blocklist" ->
      ((s: SparkSession, d: String) => domainBlocklist(s, d)),
    "q213_dump_novelty" ->
      ((s: SparkSession, d: String) => dumpNovelty(s, d)),
    "q209_padding_sweep" ->
      ((s: SparkSession, d: String) => paddingSweep(s, d)),
    "q173_cdc_chunks" -> (cdcChunks _),
    "q174_fertility" -> (fertility _),
    "q164_leakfree_split" -> (leakFreeSplit _),
    "q163_novelty" -> ((s: SparkSession, d: String) => noveltyScore(s, d)),
    "q161_span_corrupt" -> (spanCorrupt _),
    "q158_ict_pairs" -> (ictPairs _),
    "q159_source_dashboard" -> (sourceDashboard _),
    "q156_priority_sample" -> ((s: SparkSession, d: String) => prioritySample(s, d)),
    "q155_html_extract" -> (htmlExtract _),
    "q144_gopher_rules" -> (gopherRules _),
    "q131_length_buckets" -> (lengthBuckets _),
    "q122_shard_shuffle"    -> ((s: SparkSession, d: String) => shardShuffle(s, d)),
    "q240_resume_at"        -> ((s: SparkSession, d: String) => resumeAt(s, d)),
    "q90_split"             -> (trainValTestSplit _),
    "q72_repetition"        -> (repetitionSignals _),
    "q58_stratified_sample" -> (stratifiedSample _),
    "q59_token_packing"     -> (tokenPacking _),
    "q244_global_pack"      -> ((s: SparkSession, d: String) =>
      globalPack(s, d)),
    "q76_pii_redact"        -> (piiRedact _),
    "q78_script_mix"        -> (scriptMix _),
    "q79_chunking"          -> ((s: SparkSession, d: String) => chunkDocuments(s, d)),
    "q82_normalize"         -> (normalizeText _),
    "q84_bpe_pairs"         -> (bpePairCounts _),
    "q27_text_stats"  -> (textStats _),
    "q28_lang_id"     -> (langIdQuery _),
    "q29_quality"     -> (qualityQuery _),
    "q30_token_count" -> (tokenCounts _),
    "q31_fingerprint" -> (fingerprintQuery _),
    "q49_rolling_fp"  -> (rollingFingerprint _),
    "q99_substring_dup" -> ((s: SparkSession, d: String) => substringDup(s, d)),
    "q226_filter_ablation" -> (filterAblation _),
    "q133_span_strike" -> ((s: SparkSession, d: String) => spanStrike(s, d)))

  // DuckDB formulations of the same expressions. `words` =
  // string_split_regex(trim(lower(text)),'\s+'); stopword/marker logic uses
  // the identical word lists.
  private[operators] val wordsSql = raw"string_split_regex(trim(lower(text)), '\s+')"
  private val punctSql =
    "CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0)"
  private val stopSql =
    s"CAST(len(list_filter($wordsSql, w -> w IN ('the','a','and','of','to','in','is'))) AS DOUBLE) / greatest(CAST(len($wordsSql) AS DOUBLE), 1.0)"
  private[operators] val qualitySql =
    s"(floor((0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) + 0.3 * least($stopSql * 5.0, 1.0) + 0.3 * (1.0 - least($punctSql * 10.0, 1.0))) * 1000000.0) / 1000000.0)"
  private def hitsSql(ms: Seq[String]) = ms.map(m =>
    s"CASE WHEN contains(' ' || lower(text) || ' ', ' $m ') THEN 1 ELSE 0 END")
    .mkString(" + ")
  private val enS = hitsSql(Seq("the", "a", "of", "and", "is"))
  private val deS = hitsSql(Seq("der", "die", "und", "ist", "das"))
  private val frS = hitsSql(Seq("le", "la", "et", "est", "les"))
  private val esS = hitsSql(Seq("el", "los", "y", "es", "las"))
  private val langSql =
    s"""CASE WHEN greatest($enS, $deS, $frS, $esS) = 0 THEN 'und'
        WHEN ($enS) >= ($deS) AND ($enS) >= ($frS) AND ($enS) >= ($esS) THEN 'en'
        WHEN ($deS) >= ($frS) AND ($deS) >= ($esS) THEN 'de'
        WHEN ($frS) >= ($esS) THEN 'fr'
        ELSE 'es' END"""

  private val grams2Sql =
    s"""CASE WHEN len($wordsSql) >= 2
        THEN list_transform(range(1, len($wordsSql)),
               i -> array_to_string(($wordsSql)[i:i+1], ' '))
        ELSE [trim(lower(text))] END"""

  // 3-gram shingles, the TextFunctions.shingles3 mirror (same fallback)
  private[operators] val grams3Sql =
    s"""CASE WHEN len($wordsSql) >= 3
        THEN list_transform(range(1, len($wordsSql) - 1),
               i -> array_to_string(($wordsSql)[i:i+2], ' '))
        ELSE [trim(lower(text))] END"""

  val oracles: Map[String, String] = Map(
    // q226: same four integer-exact flags, same one-aggregate fold, the
    // 6-row matrix spelled as UNION ALL (SQL has no struct-explode)
    "q226_filter_ablation" -> {
      val flags =
        s"""SELECT doc_id,
             CASE WHEN n_chars BETWEEN 200 AND 2000 THEN 1 ELSE 0 END AS f_len,
             CASE WHEN len($wordsSql) >= 20 THEN 1 ELSE 0 END AS f_words,
             CASE WHEN len(list_intersect($wordsSql,
               ['the','be','to','of','and','that','have','with'])) >= 2
               THEN 1 ELSE 0 END AS f_stop,
             CASE WHEN 1000000 * len(list_filter($wordsSql,
               w -> regexp_matches(w, '[a-z]'))) // len($wordsSql) >= 800000
               THEN 1 ELSE 0 END AS f_alpha
           FROM documents"""
      val names = Seq("f_len", "f_words", "f_stop", "f_alpha")
      val pairs = for {
        i <- names.indices; j <- (i + 1) until names.size
      } yield (names(i), names(j))
      val sums = (names.map(n => s"CAST(sum($n) AS BIGINT) AS n_$n") ++
        pairs.map { case (a, b) =>
          s"CAST(sum($a * $b) AS BIGINT) AS n_${a}_$b" }).mkString(", ")
      val rows = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS filter_a, '$b' AS filter_b,
              n_$a AS n_a, n_$b AS n_b, n_${a}_$b AS n_both,
              CASE WHEN n_$a + n_$b - n_${a}_$b = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(1000000 * n_${a}_$b //
                  (n_$a + n_$b - n_${a}_$b) AS BIGINT) END AS overlap_ppm
            FROM a"""
      }.mkString(" UNION ALL ")
      s"""WITH b AS ($flags), a AS (SELECT $sums FROM b)
          $rows ORDER BY filter_a, filter_b"""
    },
    // q221: same distinct-value cumulative window, same strict-before
    // bucket rule
    "q221_equidepth_hist" ->
      """WITH vc AS (
           SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY n_chars),
         t AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM vc),
         cb AS (
           SELECT v, c,
             CAST(coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
           FROM vc)
         SELECT least(7, 8 * cum_before // n_total) AS bucket,
           CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi,
           CAST(sum(c) AS BIGINT) AS n_docs
         FROM cb, t GROUP BY 1 ORDER BY bucket""",
    // q211: same host synthesis, same bounded suffix explode, same
    // longest-rule precedence
    "q211_domain_blocklist" ->
      """WITH d AS (
           SELECT doc_id, source,
             'h' || (doc_id % 13) || '.' || source || '.example.com'
               AS host
           FROM documents),
         s AS (
           SELECT doc_id, host,
             unnest([host, source || '.example.com', 'example.com',
               'com']) AS suffix
           FROM d),
         r AS (
           SELECT unnest(['src3.example.com', 'src1.example.com',
             'h7.src1.example.com', 'h11.src0.example.com',
             'badtld.net']) AS rule),
         m AS (
           SELECT doc_id, host, rule,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY length(rule) DESC, rule ASC) AS rn
           FROM s JOIN r ON suffix = rule)
         SELECT doc_id, host, rule AS blocked_by
         FROM m WHERE rn = 1 ORDER BY doc_id""",
    // q213: same dump assignment, same first-dump rule, all BIGINT
    "q213_dump_novelty" ->
      s"""WITH ph AS (
            SELECT doc_id % 4 AS dump, md5(text) AS h,
              len($wordsSql) AS tok
            FROM documents),
          ag AS (
            SELECT dump, h, count(*) AS n_docs, max(tok) AS tok1
            FROM ph GROUP BY dump, h),
          fd AS (SELECT h, min(dump) AS first_dump FROM ag GROUP BY h)
          SELECT CAST(dump AS BIGINT) AS dump,
            CAST(sum(n_docs) AS BIGINT) AS n_docs,
            CAST(count(*) AS BIGINT) AS n_hashes,
            CAST(sum(CASE WHEN dump = first_dump THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new_hashes,
            CAST(sum(CASE WHEN dump = first_dump THEN tok1 ELSE 0 END)
              AS BIGINT) AS new_tokens,
            CAST(1000000 * sum(CASE WHEN dump = first_dump THEN 1 ELSE 0
              END) // count(*) AS BIGINT) AS novelty_ppm
          FROM ag JOIN fd USING (h) GROUP BY dump ORDER BY dump""",
    // q209: same candidate explode, same least/greatest clamps — all
    // exact BIGINT
    "q209_padding_sweep" ->
      """WITH t AS (
           SELECT n_chars // 4 AS tok, max_len
           FROM documents,
             (SELECT unnest([128, 256, 512, 1024]) AS max_len))
         SELECT CAST(max_len AS BIGINT) AS max_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS total_tokens,
           CAST(sum(least(tok, max_len)) AS BIGINT) AS kept_tokens,
           CAST(sum(max_len - least(tok, max_len)) AS BIGINT)
             AS pad_tokens,
           CAST(sum(greatest(0, tok - max_len)) AS BIGINT)
             AS trunc_tokens,
           CAST(1000000 * sum(least(tok, max_len)) //
             (count(*) * max_len) AS BIGINT) AS util_ppm
         FROM t GROUP BY max_len ORDER BY max_len""",
    // same per-(doc, block) seeded slot, same block slicing (both
    // engines clamp the final short block), same sentinel text — exact
    "q161_span_corrupt" ->
      s"""WITH t AS (
            SELECT doc_id, $wordsSql AS ws FROM documents),
          p AS (
            SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_tokens,
              (CAST(len(ws) AS BIGINT) + 2) // 3 AS nb
            FROM t),
          m AS (
            SELECT doc_id, ws, n_tokens, nb,
              list_transform(range(0, nb), b ->
                CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                  || '#sc42#' || CAST(b AS VARCHAR)), 1, 4)) AS BIGINT)
                  < 9830) AS mk
            FROM p)
          SELECT doc_id, n_tokens,
            CAST(len(list_filter(range(0, nb),
              b -> mk[CAST(b + 1 AS INT)])) AS BIGINT) AS n_masked,
            md5(coalesce(array_to_string(flatten(
              list_transform(range(0, nb), b ->
                CASE WHEN mk[CAST(b + 1 AS INT)]
                  THEN ['<extra_id_' || CAST(b AS VARCHAR) || '>']
                  ELSE ws[CAST(b * 3 + 1 AS INT):CAST(b * 3 + 3 AS INT)]
                END)), ' '), '')) AS corrupted_md5,
            md5(coalesce(array_to_string(flatten(
              list_transform(range(0, nb), b ->
                CASE WHEN mk[CAST(b + 1 AS INT)]
                  THEN list_prepend(
                    '<extra_id_' || CAST(b AS VARCHAR) || '>',
                    ws[CAST(b * 3 + 1 AS INT):CAST(b * 3 + 3 AS INT)])
                  ELSE [] END)), ' '), '')) AS targets_md5
          FROM m ORDER BY doc_id""",
    // same seeded-md5 line pick (non-negative, so pmod and % agree),
    // same 0-based/1-based index bridge, same md5 fingerprints — exact
    "q158_ict_pairs" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, chr(10)) AS ls
           FROM documents),
         p AS (
           SELECT doc_id, ls, CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
               || '#ict42'), 1, 15)) AS BIGINT)
               % CAST(len(ls) AS BIGINT) AS q_idx
           FROM t)
         SELECT doc_id, n_lines, q_idx,
           md5(ls[CAST(q_idx + 1 AS INT)]) AS query_md5,
           md5(coalesce(array_to_string(list_transform(
             list_filter(range(1, len(ls) + 1), i -> i <> q_idx + 1),
             i -> ls[i]), ' '), '')) AS context_md5
         FROM p ORDER BY doc_id""",
    // same window dup count, same integer-ppm quality fold — the mean is
    // an order-free BIGINT division in both engines
    "q159_source_dashboard" ->
      s"""WITH d AS (
            SELECT source, lang, text,
              count(*) OVER (PARTITION BY md5(text)) AS n_same,
              CAST(floor(($qualitySql) * 1e6) AS BIGINT) AS q_ppm,
              CAST(len($wordsSql) AS BIGINT) AS n_toks
            FROM documents)
          SELECT source, lang,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_toks) AS BIGINT) AS total_tokens,
            CAST(sum(length(text)) AS BIGINT) // count(*) AS mean_chars,
            CAST(sum(q_ppm) AS BIGINT) // count(*) AS mean_quality_ppm,
            (1000000 * CAST(sum(CASE WHEN n_same > 1 THEN 1 ELSE 0 END)
              AS BIGINT)) // count(*) AS dup_ppm
          FROM d GROUP BY source, lang ORDER BY source, lang""",
    // same seeded 16-bit md5 slot, same integer priority — the top-k set
    // and its order are a pure function of the data
    "q156_priority_sample" ->
      """WITH p AS (
           SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
               || '#pri42'), 1, 4)) AS BIGINT) AS u16
           FROM documents),
         q AS (
           SELECT doc_id, w, u16, (w * 65536) // (u16 + 1) AS priority
           FROM p),
         r AS (
           SELECT doc_id, w, u16, priority,
             CAST(ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id)
               AS BIGINT) AS rank
           FROM q)
         SELECT rank, doc_id, w, u16, priority
         FROM r WHERE rank <= 50 ORDER BY rank""",
    // same synthesized markup, same non-greedy <p> extraction (Java
    // regex and RE2 agree on .*?), same link filter and md5 — exact
    "q155_html_extract" ->
      """WITH h AS (
           SELECT doc_id,
             '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
             '</title></head><body><nav><a href="/">Home</a> | ' ||
             '<a href="/about">About</a></nav>' ||
             CASE WHEN doc_id % 5 = 0
               THEN '<p><a href="/ad">Click here</a> to subscribe</p>'
               ELSE '' END ||
             '<p>' || replace(text, chr(10), '</p><p>') || '</p>' ||
             '<footer>(c) 2026 Example Corp - ' ||
             '<a href="/tos">Terms</a></footer></body></html>' AS html
           FROM documents),
         p AS (
           SELECT doc_id, html,
             regexp_extract_all(html, '<p>(.*?)</p>', 1) AS paras
           FROM h),
         k AS (
           SELECT doc_id, html, paras,
             list_filter(paras, x -> NOT contains(x, '<a ')) AS kept
           FROM p),
         j AS (
           SELECT doc_id, html, paras, kept,
             array_to_string(kept, ' ') AS joined
           FROM k)
         SELECT doc_id,
           CAST(len(paras) AS BIGINT) AS n_paras,
           CAST(len(kept) AS BIGINT) AS n_kept,
           (1000000 * length(joined)) // length(html) AS retained_ppm,
           md5(joined) AS text_md5
         FROM j ORDER BY doc_id""",
    // same in-query line synthesis, same ppm integer arithmetic — every
    // ratio is (1e6 * num) // den on BIGINTs, bit-identical across engines
    "q144_gopher_rules" ->
      s"""WITH p AS (
            SELECT doc_id,
              concat(
                CASE WHEN doc_id % 3 = 0 THEN '- overview' || chr(10)
                     ELSE '' END,
                text,
                CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'read more...'
                     ELSE '' END) AS raw
            FROM documents),
          m AS (
            SELECT doc_id, raw,
              string_split(raw, chr(10)) AS ls,
              string_split_regex(trim(lower(raw)), '\\s+') AS ws
            FROM p),
          n AS (
            SELECT doc_id,
              CAST(len(ws) AS BIGINT) AS n_words,
              CAST(len(ls) AS BIGINT) AS n_lines,
              CAST(list_sum(list_transform(ws, w -> length(w)))
                AS BIGINT) AS word_chars,
              CAST(length(raw) - length(replace(raw, '#', '')) +
                (length(raw) - length(replace(raw, '...', ''))) // 3
                AS BIGINT) AS n_sym,
              CAST(len(list_filter(ls,
                l -> substring(trim(l), 1, 1) IN ('-', '*')))
                AS BIGINT) AS n_bullet,
              CAST(len(list_filter(ls, l -> right(l, 3) = '...'))
                AS BIGINT) AS n_ellipsis,
              CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                AS BIGINT) AS n_alpha,
              CAST(len(list_intersect(ws,
                ['the','be','to','of','and','that','have','with']))
                AS BIGINT) AS stop_hits
            FROM m),
          r AS (
            SELECT doc_id, n_words, stop_hits,
              (1000000 * word_chars) // n_words AS mean_len_ppm,
              (1000000 * n_sym) // n_words AS sym_ppm,
              (1000000 * n_bullet) // n_lines AS bullet_ppm,
              (1000000 * n_ellipsis) // n_lines AS ellipsis_ppm,
              (1000000 * n_alpha) // n_words AS alpha_ppm
            FROM n)
          SELECT doc_id, n_words, mean_len_ppm, sym_ppm, bullet_ppm,
            ellipsis_ppm, alpha_ppm, stop_hits,
            CASE WHEN n_words BETWEEN 50 AND 100000
              AND mean_len_ppm BETWEEN 3000000 AND 10000000
              AND sym_ppm <= 100000
              AND bullet_ppm < 900000
              AND ellipsis_ppm < 300000
              AND alpha_ppm >= 800000
              AND stop_hits >= 2 THEN 1 ELSE 0 END AS keep
          FROM r ORDER BY doc_id""",
    "q131_length_buckets" ->
      s"""WITH t AS (
            SELECT CAST(power(2, ceil(log2(len($wordsSql)))) AS BIGINT) AS bucket,
              len($wordsSql) AS n_tokens
            FROM documents)
          SELECT bucket, COUNT(*) AS n_docs,
            CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
            CAST(SUM(bucket - n_tokens) AS BIGINT) AS pad_waste,
            CAST(CAST(CAST(SUM(bucket - n_tokens) AS DOUBLE) /
              CAST(COUNT(*) * bucket AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE)
              AS waste_ratio
          FROM t GROUP BY bucket ORDER BY bucket""",
    // the same seeded-md5 digit/rank construction: shard and training
    // order are pure functions of the id, bit-identical across engines
    // q240: the order-statistics decomposition replayed as the plain
    // global ROW_NUMBER over the same (md5, doc_id) order key
    "q240_resume_at" ->
      """WITH h AS (
           SELECT doc_id,
                  md5(CAST(doc_id AS VARCHAR) || '#shard42') AS h
           FROM documents),
         r AS (
           SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY h, doc_id) - 1
                    AS BIGINT) AS rank
           FROM h)
         SELECT rank, doc_id FROM r
         WHERE rank >= 100 AND rank < 120 ORDER BY rank""",
    "q122_shard_shuffle" ->
      """WITH h AS (
           SELECT doc_id,
                  md5(CAST(doc_id AS VARCHAR) || '#shard42') AS h
           FROM documents),
         a AS (
           SELECT doc_id,
                  CAST(strpos('0123456789abcdef', substring(h, 1, 1)) - 1
                    AS BIGINT) AS shard,
                  substring(h, 2) AS ord
           FROM h)
         SELECT doc_id, shard,
                CAST(row_number() OVER (PARTITION BY shard ORDER BY ord)
                  AS BIGINT) AS pos
         FROM a ORDER BY shard, pos""",
    // the same md5 membership function and thresholds — a doc's split is
    // a pure function of its id in both engines
    "q90_split" ->
      """SELECT doc_id, lang,
           CASE
             WHEN substring(md5(CAST(doc_id AS VARCHAR) || '#split42'), 1, 4)
                  < 'e666' THEN 'train'
             WHEN substring(md5(CAST(doc_id AS VARCHAR) || '#split42'), 1, 4)
                  < 'f333' THEN 'val'
             ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "q72_repetition" ->
      s"""WITH g AS (
            SELECT doc_id, unnest($grams2Sql) AS g FROM documents),
          c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
          t AS (SELECT doc_id,
                  floor(CAST(max(c) AS DOUBLE) / sum(c) * 1000000.0)
                    / 1000000.0 AS top2_frac
                FROM c GROUP BY 1),
          w AS (SELECT doc_id,
                  floor((1.0 - CAST(len(list_distinct($wordsSql)) AS DOUBLE)
                    / len($wordsSql)) * 1000000.0) / 1000000.0 AS dup_word_frac
                FROM documents)
          SELECT t.doc_id, t.top2_frac, w.dup_word_frac
          FROM t JOIN w USING (doc_id) ORDER BY doc_id""",
    // hash-based sampling is engine-independent: DuckDB replays the exact
    // md5 membership function (en 0.25→0x4000, zh 0.5→0x8000)
    "q58_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE CASE lang
           WHEN 'en' THEN substring(md5(CAST(doc_id AS VARCHAR) || '#42'), 1, 4) < '4000'
           WHEN 'zh' THEN substring(md5(CAST(doc_id AS VARCHAR) || '#42'), 1, 4) < '8000'
           WHEN 'de' THEN TRUE WHEN 'fr' THEN TRUE WHEN 'es' THEN TRUE
           ELSE FALSE END
         ORDER BY doc_id""",
    // same in-query PII synthesis, same regexes (Java and RE2 agree on
    // these lookaround-free patterns), same innermost-first redaction order
    "q76_pii_redact" ->
      s"""WITH p AS (
            SELECT doc_id,
              concat('contact user', CAST(doc_id AS VARCHAR), '@example.com',
                CASE WHEN doc_id % 3 = 0
                  THEN concat(' call +1-555-',
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                  ELSE '' END,
                CASE WHEN doc_id % 5 = 0
                  THEN concat(' from 10.0.', CAST(doc_id % 256 AS VARCHAR),
                    '.', CAST((doc_id * 7) % 256 AS VARCHAR))
                  ELSE '' END,
                ' ', text) AS pii
            FROM documents)
          SELECT doc_id,
            CAST(len(regexp_extract_all(pii, '$EmailRe')) AS BIGINT) AS n_emails,
            CAST(len(regexp_extract_all(pii, '$PhoneRe')) AS BIGINT) AS n_phones,
            CAST(len(regexp_extract_all(pii, '$Ipv4Re')) AS BIGINT) AS n_ips,
            substring(
              regexp_replace(
                regexp_replace(
                  regexp_replace(pii, '$EmailRe', '<EMAIL>', 'g'),
                  '$PhoneRe', '<PHONE>', 'g'),
                '$Ipv4Re', '<IP>', 'g'),
              1, 64) AS redacted_head
          FROM p ORDER BY doc_id""",
    // same tokenization, same in-word bigram windows (DuckDB range(1,n)
    // is [1,n) = Spark sequence(1, n-1) inclusive), HUGEINT-safe count
    "q84_bpe_pairs" ->
      s"""WITH w AS (
            SELECT unnest($wordsSql) AS w FROM documents),
          p AS (
            SELECT unnest(list_transform(range(1, length(w)),
              i -> substring(w, CAST(i AS INT), 2))) AS pair
            FROM w WHERE length(w) >= 2)
          SELECT pair, CAST(count(*) AS BIGINT) AS n_pairs
          FROM p GROUP BY pair ORDER BY n_pairs DESC, pair""",
    // the same decomposed-accent synthesis (chr() builds the combining
    // marks), DuckDB's own nfc_normalize, and the same RE2-compatible
    // cleanup regexes — an independent Unicode implementation must agree
    // byte for byte
    "q82_normalize" ->
      raw"""WITH r AS (
            SELECT doc_id,
              concat('x ', chr(9), ' ',
                CASE CAST(doc_id % 3 AS INT)
                  WHEN 0 THEN 'cafe' || chr(769)
                  WHEN 1 THEN 'A' || chr(778)
                  ELSE 'o' || chr(776) END,
                ' ', chr(1), ' ', text) AS raw
            FROM documents),
          c AS (
            SELECT doc_id, raw,
              trim(regexp_replace(regexp_replace(nfc_normalize(raw),
                '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', ' ', 'g'),
                '\s+', ' ', 'g')) AS clean
            FROM r)
          SELECT doc_id,
            CAST(length(raw) AS BIGINT) AS n_raw,
            CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc,
            CAST(length(clean) AS BIGINT) AS n_clean,
            substring(clean, 1, 48) AS clean_head
          FROM c ORDER BY doc_id""",
    // same closed-form chunk count (ceil via integer-safe floor over
    // doubles — values << 2^53), same 1-based clamped slice: Spark
    // slice(ws, start, 64) == DuckDB ws[start : least(start+63, n)]
    "q79_chunking" ->
      s"""WITH t AS (
            SELECT doc_id, $wordsSql AS ws,
              CAST(len($wordsSql) AS BIGINT) AS n_tokens
            FROM documents),
          n AS (
            SELECT doc_id, ws, n_tokens,
              CASE WHEN n_tokens <= 64 THEN CAST(1 AS BIGINT)
                   ELSE 1 + CAST(floor(
                     CAST(n_tokens - 64 + 47 AS DOUBLE) / 48.0) AS BIGINT)
              END AS n_chunks
            FROM t),
          c AS (
            SELECT doc_id, ws, n_tokens,
              unnest(generate_series(CAST(0 AS BIGINT), n_chunks - 1))
                AS chunk_id
            FROM n)
          SELECT doc_id, chunk_id,
            chunk_id * 48 + 1 AS start_token,
            CAST(len(ws[CAST(chunk_id * 48 + 1 AS INT) :
              CAST(least(chunk_id * 48 + 64, n_tokens) AS INT)]) AS BIGINT)
              AS n_chunk_tokens,
            array_to_string(ws[CAST(chunk_id * 48 + 1 AS INT) :
              CAST(least(chunk_id * 48 + 64, n_tokens) AS INT)], ' ')
              AS chunk_text
          FROM c ORDER BY doc_id, chunk_id""",
    "q78_script_mix" ->
      raw"""SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_latin,
          CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
          CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS n_space,
          CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS BIGINT) AS n_cjk,
          floor(CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
            / greatest(CAST(length(text) AS DOUBLE), 1.0) * 1000000.0)
            / 1000000.0 AS latin_frac,
          CASE WHEN len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]'))
                 > len(regexp_extract_all(text, '[A-Za-z]')) THEN 'cjk'
               WHEN len(regexp_extract_all(text, '[A-Za-z]')) > 0 THEN 'latin'
               ELSE 'other' END AS dominant
          FROM documents ORDER BY doc_id""",
    "q59_token_packing" ->
      s"""SELECT doc_id, lang, len($wordsSql) AS n_tokens,
          CAST(SUM(len($wordsSql)) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
          CAST(FLOOR(CAST(SUM(len($wordsSql)) OVER (PARTITION BY lang
            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - len($wordsSql) AS DOUBLE) / 2048.0) AS BIGINT) AS batch_id
          FROM documents ORDER BY lang, doc_id""",
    // q244: the two-phase bucket decomposition replayed as the plain
    // global exclusive prefix sum it must equal
    "q244_global_pack" ->
      s"""WITH t AS (
            SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS n_tokens
            FROM documents),
          c AS (
            SELECT doc_id, n_tokens,
              CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cum_before
            FROM t)
          SELECT doc_id, n_tokens,
            cum_before // 2048 AS batch_id,
            cum_before % 2048 AS offset_in_batch
          FROM c ORDER BY doc_id""",
    "q27_text_stats" ->
      s"""SELECT doc_id, length(text) AS n_chars_m,
          len($wordsSql) AS n_words,
          round(CAST(length(text) AS DOUBLE) / greatest(CAST(len($wordsSql) AS DOUBLE), 1.0), 6) AS chars_per_word,
          round($punctSql, 6) AS punct_ratio
          FROM documents ORDER BY doc_id""",
    "q28_lang_id" ->
      s"""SELECT doc_id, lang, $langSql AS lang_pred,
          CAST(lang = ($langSql) AS INTEGER) AS agrees
          FROM documents ORDER BY doc_id""",
    "q29_quality" ->
      s"""SELECT doc_id, $qualitySql AS quality,
          CAST($qualitySql >= 0.5 AS INTEGER) AS keep
          FROM documents ORDER BY doc_id""",
    "q30_token_count" ->
      s"""SELECT doc_id, len($wordsSql) AS n_ws_tokens,
          len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpe_tokens
          FROM documents ORDER BY doc_id""",
    "q31_fingerprint" ->
      s"""WITH fp AS (
            SELECT doc_id,
              md5(array_to_string(list_sort(list_distinct($wordsSql)), ' ')) AS fp
            FROM documents)
          SELECT doc_id, fp, n_same_fp FROM fp
          JOIN (SELECT fp, COUNT(*) AS n_same_fp FROM fp GROUP BY fp) c USING (fp)
          ORDER BY doc_id""",
    // same 8-char rolling-hash boundaries, same chunk md5s, same
    // distinct-pair corpus count
    "q173_cdc_chunks" ->
      """WITH h AS (
           SELECT doc_id, text,
             list_transform(string_split_regex(text, ''),
               c -> CAST(ascii(c) AS BIGINT)) AS hs
           FROM documents WHERE length(text) >= 1),
         w8 AS (
           SELECT doc_id, text, CAST(len(hs) AS BIGINT) AS n,
             CASE WHEN len(hs) >= 8 THEN
               list_filter(list_transform(range(1, len(hs) - 8 + 2),
                 i -> CASE WHEN list_reduce(
                     list_prepend(CAST(0 AS BIGINT), hs[i:i+7]),
                     (a, c) -> (a * 131 + c) % 1000000007) % 32 = 0
                   THEN CAST(i + 7 AS BIGINT) END),
                 x -> x IS NOT NULL)
             ELSE [] END AS ends
           FROM h),
         b AS (
           SELECT doc_id, text, n,
             [CAST(0 AS BIGINT)] || ends ||
               (CASE WHEN len(ends) > 0 AND ends[-1] = n
                 THEN [] ELSE [n] END) AS bounds
           FROM w8),
         c AS (
           SELECT doc_id, CAST(len(bounds) - 1 AS BIGINT) AS n_chunks,
             list_distinct(list_transform(range(1, len(bounds)),
               i -> md5(text[bounds[i]+1:bounds[i+1]]))) AS fps
           FROM b),
         e AS (
           SELECT doc_id, n_chunks, CAST(len(fps) AS BIGINT) AS n_distinct,
             unnest(fps) AS fp
           FROM c),
         g AS (SELECT fp, count(*) AS nd FROM e GROUP BY fp)
         SELECT e.doc_id, max(e.n_chunks) AS n_chunks,
           max(e.n_distinct) AS n_distinct_chunks,
           CAST(sum(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
           CAST(sum(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) * 1000000
             // max(e.n_distinct) AS BIGINT) AS dup_ppm
         FROM e JOIN g USING (fp)
         GROUP BY e.doc_id ORDER BY doc_id""",
    // same integer fertility over the q30 token definitions
    "q174_fertility" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(len($wordsSql)) AS BIGINT) AS ws_tokens,
          CAST(sum(len(regexp_extract_all(text,
            '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT) AS bpe_tokens,
          CAST(sum(len(regexp_extract_all(text,
            '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) * 1000000
            // sum(len($wordsSql)) AS BIGINT) AS fertility_ppm
          FROM documents GROUP BY lang ORDER BY lang""",
    // same fingerprint window, same seeded rep-id slot and hex
    // thresholds — identical groups land in identical splits
    "q164_leakfree_split" ->
      """WITH r AS (
           SELECT doc_id,
             min(doc_id) OVER (PARTITION BY md5(text)) AS rep_id
           FROM documents)
         SELECT doc_id, rep_id,
           CASE
             WHEN substring(md5(CAST(rep_id AS VARCHAR) || '#split42'),
               1, 4) < 'e666' THEN 'train'
             WHEN substring(md5(CAST(rep_id AS VARCHAR) || '#split42'),
               1, 4) < 'f333' THEN 'val'
             ELSE 'test' END AS split
         FROM r ORDER BY doc_id""",
    "q163_novelty" -> {
      val whash = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split_regex(w, ''), " +
        "c -> CAST(ascii(c) AS BIGINT))), " +
        "(acc, c) -> (acc * 31 + c) % 1000000007)"
      // q99's gram table made DISTINCT per doc, first occurrence via
      // min(doc_id) — the same integers in both engines
      s"""WITH h AS (
            SELECT doc_id,
              list_transform($wordsSql, w -> $whash) AS hs
            FROM documents),
          g AS (
            SELECT doc_id, unnest(list_distinct(
              CASE WHEN len(hs) >= 8 THEN
                list_transform(range(1, len(hs) - 8 + 2),
                  i -> list_reduce(
                    list_prepend(CAST(0 AS BIGINT), hs[i:i+7]),
                    (acc, x) -> (acc * 131 + x) % 1000000007))
              ELSE [] END)) AS gr
            FROM h),
          f AS (SELECT gr, min(doc_id) AS first_doc FROM g GROUP BY gr)
          SELECT g.doc_id,
            CAST(count(*) AS BIGINT) AS n_grams,
            CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel,
            CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
              * 1000000 // count(*) AS BIGINT) AS novelty_ppm
          FROM g JOIN f USING (gr)
          GROUP BY g.doc_id ORDER BY doc_id"""
    },
    "q99_substring_dup" -> {
      val whash = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split_regex(w, ''), " +
        "c -> CAST(ascii(c) AS BIGINT))), " +
        "(acc, c) -> (acc * 31 + c) % 1000000007)"
      // same 8-gram polynomial fold over the same word hashes; DuckDB
      // list slices are 1-based inclusive, range() is end-exclusive
      s"""WITH h AS (
            SELECT doc_id,
              list_transform($wordsSql, w -> $whash) AS hs
            FROM documents),
          g AS (
            SELECT doc_id, unnest(
              CASE WHEN len(hs) >= 8 THEN
                list_transform(range(1, len(hs) - 8 + 2),
                  i -> list_reduce(
                    list_prepend(CAST(0 AS BIGINT), hs[i:i+7]),
                    (acc, x) -> (acc * 131 + x) % 1000000007))
              ELSE [] END) AS gr
            FROM h),
          c AS (SELECT gr, count(*) AS n FROM g GROUP BY gr)
          SELECT doc_id,
            count(*) AS n_grams,
            CAST(sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_dup_grams,
            CAST(sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) * 1000000
              // count(*) AS BIGINT) AS dup_ppm
          FROM g JOIN c USING (gr)
          GROUP BY doc_id ORDER BY doc_id"""
    },
    "q133_span_strike" -> {
      val whash = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split_regex(w, ''), " +
        "c -> CAST(ascii(c) AS BIGINT))), " +
        "(acc, c) -> (acc * 31 + c) % 1000000007)"
      // q99's gram table with positions kept; first-occurrence keep rule
      // via (doc_id, p) row_number; k-fan of struck spans; in-order
      // reassembly with string_agg ORDER BY position
      s"""WITH wsx AS (
            SELECT doc_id, $wordsSql AS ws FROM documents),
          h AS (
            SELECT doc_id, ws, list_transform(ws, w -> $whash) AS hs
            FROM wsx),
          g0 AS (
            SELECT doc_id, unnest(
              CASE WHEN len(hs) >= 8 THEN
                list_transform(range(1, len(hs) - 8 + 2),
                  i -> {'p': i - 1, 'gr': list_reduce(
                    list_prepend(CAST(0 AS BIGINT), hs[i:i+7]),
                    (acc, x) -> (acc * 131 + x) % 1000000007)})
              ELSE [] END) AS u
            FROM h),
          g AS (SELECT doc_id, u.p AS p, u.gr AS gr FROM g0),
          occ AS (
            SELECT doc_id, p, gr,
              count(*) OVER (PARTITION BY gr) AS n,
              ROW_NUMBER() OVER (PARTITION BY gr
                ORDER BY doc_id, p) AS rn
            FROM g),
          off AS (SELECT unnest(range(0, 8)) AS o),
          struck AS (
            SELECT DISTINCT doc_id, p + o AS wpos
            FROM occ CROSS JOIN off WHERE n > 1 AND rn > 1),
          wp0 AS (
            SELECT doc_id, unnest(
              list_transform(range(1, len(ws) + 1),
                i -> {'wpos': i - 1, 'w': ws[i]})) AS u
            FROM wsx),
          wp AS (SELECT doc_id, u.wpos AS wpos, u.w AS w FROM wp0)
          SELECT wp.doc_id, count(*) AS n_words,
            CAST(sum(CASE WHEN s.wpos IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_struck,
            coalesce(string_agg(CASE WHEN s.wpos IS NULL THEN wp.w END,
              ' ' ORDER BY wp.wpos), '') AS clean_text
          FROM wp LEFT JOIN struck s
            ON s.doc_id = wp.doc_id AND s.wpos = wp.wpos
          GROUP BY wp.doc_id ORDER BY wp.doc_id"""
    },
    "q49_rolling_fp" -> {
      val whash = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split_regex(w, ''), " +
        "c -> CAST(ascii(c) AS BIGINT))), " +
        "(acc, c) -> (acc * 31 + c) % 1000000007)"
      s"""WITH h AS (
            SELECT doc_id,
              list_transform($wordsSql, w -> $whash) AS hs
            FROM documents),
          g AS (
            SELECT doc_id, hs,
              list_transform(range(1, len(hs) - 1),
                i -> ((hs[i] * 131 + hs[i+1]) % 1000000007 * 131 + hs[i+2])
                     % 1000000007) AS gs
            FROM h)
          SELECT doc_id,
            CASE WHEN len(hs) >= 3 THEN list_min(gs)
                 ELSE list_min(hs) END AS fp_min,
            CASE WHEN len(hs) >= 3
                 THEN CAST(len(list_distinct(gs)) AS BIGINT)
                 ELSE CAST(len(list_distinct(hs)) AS BIGINT)
            END AS n_distinct_grams
          FROM g ORDER BY doc_id"""
    })
}
