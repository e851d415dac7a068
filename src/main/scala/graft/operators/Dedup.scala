package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Deduplication for LLM-training corpora over the `documents` table:
  * exact (hash group-by), near-dup via MinHash+LSH banding, SimHash with
  * hamming-band joins, and n-gram Jaccard within blocking buckets.
  *
  * Scale posture: every variant is blocked/banded — candidate pairs come
  * from equi-joins on band/bucket keys (shuffle on the band hash, data-
  * proportional), never from a cross join. The expensive verification
  * (exact Jaccard) runs only on the candidate set. This is the standard
  * web-scale dedup shape (MinHashLSH as in Spark MLlib / deduplication
  * literature), expressed in pure DataFrame algebra.
  */
object Dedup {

  /** Exact dedup: md5 text hash, keep the lowest doc_id of each group
    * (hash-groupBy — two-phase aggregate, no sort). */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")

  /** MinHash signatures (12 hashes): exposes 4 signature components per
    * document for inspection; the full array feeds the LSH bands. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(
      col("doc_id"),
      minhashSig(col("text"), 0).as("sig0"),
      minhashSig(col("text"), 1).as("sig1"),
      minhashSig(col("text"), 2).as("sig2"),
      minhashSig(col("text"), 3).as("sig3"))
      .orderBy("doc_id")
  }

  /** MinHash LSH near-dup pairs: 12 signature components in 4 bands of 3;
    * docs colliding on any band key become candidates; candidates are
    * verified with exact word-set Jaccard >= 0.5. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val sigs = (0 until 12).map(i => minhashSig(col("text"), i))
    val bandCols = (0 until 4).map(b =>
      md5(concat_ws("|", (lit(b) +: sigs.slice(b * 3, b * 3 + 3)): _*))
        .as(s"band$b"))
    val bands = d.select(
      Seq(col("doc_id"), array_distinct(words(col("text"))).as("wset")) ++
        bandCols: _*)
    val exploded = bands.select(col("doc_id"), col("wset"),
      explode(array((0 until 4).map(b => col(s"band$b")): _*)).as("band_key"))
    val a = exploded.select(col("band_key"), col("doc_id").as("doc_a"),
      col("wset").as("wset_a"))
    val b = exploded.select(col("band_key"), col("doc_id").as("doc_b"),
      col("wset").as("wset_b"))
    val candidates = a.join(b, Seq("band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "wset_a", "wset_b").distinct()
    candidates
      .withColumn("jaccard", round(
        size(array_intersect(col("wset_a"), col("wset_b"))).cast("double") /
        size(array_union(col("wset_a"), col("wset_b"))).cast("double"), 6))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Per-word hash for SimHash (md5-hex-prefix → 60-bit integer). */
  private def wordHash(w: Column): Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("long")

  /** 16-bit SimHash per document: per-bit ±1 votes summed over distinct
    * words, bit set where the vote is positive. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val w = d.select(col("doc_id"),
      explode(array_distinct(words(col("text")))).as("w"))
      .withColumn("h", wordHash(col("w")))
    val votes = (0 until 16).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        .as(s"v$b"))
    val agg = w.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val sim = (0 until 16).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash")).orderBy("doc_id")
  }

  /** SimHash near-dup candidate pairs: band the 16 bits into two bytes;
    * pairs agreeing on either byte (hamming LSH) with hamming distance <= 3
    * over the full 16 bits. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val s = simhash(spark, dir)
      .withColumn("lo", col("simhash").bitwiseAND(255))
      .withColumn("hi", shiftright(col("simhash"), 8).bitwiseAND(255))
    val a = s.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"),
      col("lo").as("lo_a"), col("hi").as("hi_a"))
    val b = s.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b"),
      col("lo").as("lo_b"), col("hi").as("hi_b"))
    val byLo = a.join(b, col("lo_a") === col("lo_b") && col("doc_a") < col("doc_b"))
    val byHi = a.join(b, col("hi_a") === col("hi_b") && col("doc_a") < col("doc_b"))
    val cand = byLo.select("doc_a", "doc_b", "sh_a", "sh_b")
      .union(byHi.select("doc_a", "doc_b", "sh_a", "sh_b")).distinct()
    cand
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** N-gram (3-word shingle) Jaccard near-dup within blocking buckets
    * (lang + length decile) — blocking bounds the pair space the way a
    * 100 TB corpus requires. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast("long").as("len_bucket"),
        array_distinct(shingles3(col("text"))).as("sh"))
    val a = d.select(col("lang"), col("len_bucket"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = d.select(col("lang"), col("len_bucket"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("lang", "len_bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .filter(col("jaccard") >= 0.2)
      .select("doc_a", "doc_b", "lang", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_dedup_exact"    -> (exact _),
    "q33_minhash_sig"    -> (minhashSignatures _),
    "q34_minhash_lsh"    -> (minhashLsh _),
    "q35_simhash"        -> (simhash _),
    "q36_simhash_pairs"  -> (simhashPairs _),
    "q37_ngram_jaccard"  -> (ngramJaccard _))

  private val wordsSql = raw"string_split_regex(trim(lower(text)), '\s+')"
  private val wsetSql = s"list_distinct($wordsSql)"
  private def sigSql(i: Int) =
    s"list_min(list_transform($wsetSql, w -> md5('$i|' || w)))"
  private val shinglesSql =
    s"""CASE WHEN len($wordsSql) >= 3
        THEN list_transform(range(1, len($wordsSql) - 1),
               i -> array_to_string(($wordsSql)[i:i+2], ' '))
        ELSE [trim(lower(text))] END"""
  private val whashSql =
    "CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT)"
  private val simhashSql = {
    val votes = (0 until 16).map(b =>
      s"CAST(SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v$b")
      .mkString(", ")
    val bits = (0 until 16).map(b =>
      s"CASE WHEN v$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""WITH wx AS (
          SELECT doc_id, unnest($wsetSql) AS w FROM documents),
        hx AS (SELECT doc_id, $whashSql AS h FROM wx),
        v AS (SELECT doc_id, $votes FROM hx GROUP BY doc_id)
        SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM v"""
  }

  val oracles: Map[String, String] = Map(
    "q32_dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
         COUNT(*) AS n_copies
         FROM documents GROUP BY md5(text) ORDER BY keep_doc_id""",
    "q33_minhash_sig" ->
      s"""SELECT doc_id, ${sigSql(0)} AS sig0, ${sigSql(1)} AS sig1,
          ${sigSql(2)} AS sig2, ${sigSql(3)} AS sig3
          FROM documents ORDER BY doc_id""",
    "q34_minhash_lsh" -> {
      val sigs = (0 until 12).map(sigSql)
      val bandKeys = (0 until 4).map(b =>
        s"md5(concat_ws('|', '$b', ${sigs.slice(b * 3, b * 3 + 3).mkString(", ")})) AS band$b")
        .mkString(", ")
      s"""WITH sigs AS (
            SELECT doc_id, $wsetSql AS wset, $bandKeys FROM documents),
          ex AS (
            SELECT doc_id, wset, unnest([band0, band1, band2, band3]) AS band_key
            FROM sigs),
          cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.wset AS wset_a, b.wset AS wset_b
            FROM ex a JOIN ex b ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b,
            round(CAST(len(list_intersect(wset_a, wset_b)) AS DOUBLE) /
                  CAST(len(list_distinct(list_concat(wset_a, wset_b))) AS DOUBLE), 6) AS jaccard
          FROM cand
          WHERE round(CAST(len(list_intersect(wset_a, wset_b)) AS DOUBLE) /
                CAST(len(list_distinct(list_concat(wset_a, wset_b))) AS DOUBLE), 6) >= 0.5
          ORDER BY doc_a, doc_b"""
    },
    "q35_simhash" -> s"""$simhashSql ORDER BY doc_id""",
    "q36_simhash_pairs" ->
      s"""WITH sh AS ($simhashSql),
          k AS (SELECT doc_id, simhash, simhash & 255 AS lo,
                (simhash >> 8) & 255 AS hi FROM sh),
          cand AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.simhash AS sh_a, b.simhash AS sh_b
            FROM k a JOIN k b ON a.lo = b.lo AND a.doc_id < b.doc_id
            UNION
            SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
            FROM k a JOIN k b ON a.hi = b.hi AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b,
            CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
          FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
          ORDER BY doc_a, doc_b""",
    "q37_ngram_jaccard" ->
      s"""WITH d AS (
            SELECT doc_id, lang, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
                   list_distinct($shinglesSql) AS sh
            FROM documents)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
            round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                  CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
          FROM d a JOIN d b ON a.lang = b.lang AND a.len_bucket = b.len_bucket
            AND a.doc_id < b.doc_id
          WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE), 6) >= 0.2
          ORDER BY doc_a, doc_b""")
}
