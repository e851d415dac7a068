package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for LLM-training-data pipelines
  * (BASELINE.json north star; SURVEY.md §7.6): tokenization, language ID,
  * quality scoring, fingerprinting, MinHash signatures, SimHash.
  *
  * Everything here is a pure `Column` expression built from
  * `org.apache.spark.sql.functions` — codegen'd, no UDF/closure in the hot
  * path, so a 100 TB documents scan stays inside whole-stage codegen with
  * the text column pruned straight off the parquet footer.
  */
object TextFunctions {

  /** Whitespace word tokens of the lower-cased, trimmed text. */
  def words(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Whitespace token count (long, matching SQL engines' BIGINT len()). */
  def tokenCountWs(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * non-alnum marks (a cheap, deterministic stand-in for a real BPE
    * vocabulary's token count). */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
      .cast("long")

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Stopword-to-word ratio (English function words). */
  def stopwordRatio(text: Column): Column = {
    val ws = words(text)
    val stops = filter(ws, w => stopwords.map(s => w === s).reduce(_ || _))
    size(stops).cast("double") / greatest(size(ws).cast("double"), lit(1.0))
  }

  /** Composite document-quality score in [0,1]: length adequacy +
    * stopword naturalness + punctuation sanity. Truncated (floor) to 6
    * decimals rather than rounded: both engines floor the *identical*
    * double, whereas round() diverges on exact half-boundaries (Spark
    * rounds the binary expansion, DuckDB the shortest decimal repr). */
  def qualityScore(text: Column): Column = {
    val raw =
      lit(0.4) * least(length(text).cast("double") / lit(500.0), lit(1.0)) +
      lit(0.3) * least(stopwordRatio(text) * 5.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - least(punctRatio(text) * 10.0, lit(1.0)))
    floor(raw * 1e6).cast("double") / 1e6
  }

  /** N-gram-presence language ID over a small function-word table — the
    * classic heuristic: score each language by marker-word hits, pick the
    * best; 'und' (undetermined) when nothing matches. */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    def hits(markers: Seq[String]): Column =
      markers.map(m => when(padded.contains(s" $m "), 1).otherwise(0))
        .reduce(_ + _)
    val en = hits(Seq("the", "a", "of", "and", "is"))
    val de = hits(Seq("der", "die", "und", "ist", "das"))
    val fr = hits(Seq("le", "la", "et", "est", "les"))
    val es = hits(Seq("el", "los", "y", "es", "las"))
    when(greatest(en, de, fr, es) === 0, lit("und"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * word set (bag-of-words identity — catches shuffled near-copies). */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(words(text))), " "))

  /** MinHash signature component i: the minimum md5 over seeded words.
    * Uniform string hashing makes the lexicographic min a valid MinHash;
    * P(sig_i(A)==sig_i(B)) == Jaccard(A,B). */
  def minhashSig(text: Column, i: Int): Column =
    minhashSigOfSet(array_distinct(words(text)), i)

  /** Same over an already-materialized distinct word-set column — callers
    * computing many components should tokenize ONCE into a column and use
    * this (the text→set subtree re-evaluates per component otherwise). */
  def minhashSigOfSet(wset: Column, i: Int): Column =
    array_min(transform(wset, w => md5(concat(lit(s"$i|"), w))))

  /** The LSH banding used by the batch near-dup pair join (Dedup
    * .minhashLsh / q34) as ONE array column: 12 minhash components in 4
    * bands of 3, each band key an md5 over (band index | its components).
    * Shared with the streaming ingest gate
    * ([[graft.streaming.Streams.appendNearDedup]]) so batch and streaming
    * agree on what "collides" means. Callers should materialize the
    * distinct word-set into a column first (see [[minhashSigOfSet]]). */
  def lshBandKeysOfSet(wset: Column): Column = {
    val sigs = (0 until 12).map(i => minhashSigOfSet(wset, i))
    array((0 until 4).map(b =>
      md5(concat_ws("|", (lit(b) +: sigs.slice(b * 3, b * 3 + 3)): _*))): _*)
  }

  /** Word 3-gram shingles (null-safe: short docs fall back to the whole
    * trimmed text as a single shingle).
    *
    * Built from `zip_with` over the array and its two shifted slices
    * rather than `transform(sequence(...), i => slice(ws, i, 3))`: a
    * subtree referenced *inside* a lambda body is re-evaluated per
    * element, so the indexed form re-runs the regexp split O(n) times
    * per row; as HOF *arguments*, each `ws` evaluates once per row. */
  def shingles3(text: Column): Column = {
    val ws = words(text)
    val s3 = filter(
      zip_with(
        zip_with(ws, slice(ws, lit(2), size(ws)), (a, b) => concat(a, lit(" "), b)),
        slice(ws, lit(3), size(ws)), (ab, c) => concat(ab, lit(" "), c)),
      x => x.isNotNull)
    when(size(ws) >= 3, s3).otherwise(array(trim(lower(text))))
  }

  /** Word 2-gram shingles — same zip-of-shifted-slices shape as
    * [[shingles3]] (see that doc for why NOT an indexed lambda); short
    * docs fall back to the whole trimmed text. */
  def shingles2(text: Column): Column = {
    val ws = words(text)
    val s2 = filter(
      zip_with(ws, slice(ws, lit(2), size(ws)),
        (a, b) => concat(a, lit(" "), b)),
      x => x.isNotNull)
    when(size(ws) >= 2, s2).otherwise(array(trim(lower(text))))
  }

  /** Polynomial rolling hash of one word's characters:
    * fold((acc * 31 + ascii(c)) mod 1e9+7). Pure integer arithmetic —
    * bit-identical across engines, unlike float/md5-prefix tricks. */
  def wordRollingHash(w: Column): Column =
    aggregate(split(w, ""), lit(0L),
      (acc, c) => (acc * 31L + ascii(c)) % 1000000007L)

  /** Per-word rolling hashes for a document (applied to the word array so
    * the tokenization subtree is evaluated once per row, not per use). */
  def wordHashes(ws: Column): Column = transform(ws, wordRollingHash(_))

  /** Rolling word-trigram hashes from a *materialized* word-hash array
    * column: g_i = ((h_i·131 + h_{i+1}) mod M ·131 + h_{i+2}) mod M, via
    * the same zip-of-shifted-slices shape as [[shingles3]] (no indexed
    * lambda → no per-element re-evaluation). Null tails (from the slice
    * padding) propagate through the arithmetic and are filtered. */
  def rollingTrigramHashes(hs: Column): Column =
    filter(
      zip_with(
        zip_with(hs, slice(hs, lit(2), size(hs)),
          (a, b) => (a * 131L + b) % 1000000007L),
        slice(hs, lit(3), size(hs)),
        (ab, c) => (ab * 131L + c) % 1000000007L),
      x => x.isNotNull)

  /** SimHash bit-vote for bit b (valid for b in 0..59): +1/-1 per word
    * according to a 60-bit md5-derived word hash. Summed per document it
    * yields the sign vote (see Dedup.SimhashBits for the fingerprint width). */
  def simhashVote(word: Column, b: Int): Column = {
    // 60-bit word hash from the md5 hex prefix (engine-portable).
    val h = conv(substring(md5(word), 1, 15), 16, 10).cast("long")
    when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)
  }
}
