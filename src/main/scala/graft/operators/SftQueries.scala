package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Instruction-tuning (SFT/DPO) data-prep surface: the post-pretraining
  * stages of an LLM data pipeline, mined from the warehouse tables the
  * same way the pretraining surface ([[TextQueries]]) is.
  *
  * q165 renders interaction logs into chat-template transcripts — the
  * flatten-conversation-to-training-text step every SFT pipeline runs
  * (role-tagged turns, deterministic turn order, one row per
  * conversation). q166 constructs preference pairs — the best-vs-worst
  * candidate miner that feeds DPO/RLHF reward modeling (chosen/rejected
  * per prompt cohort, with the score margin the trainer weights by).
  *
  * Both are exact-integer/md5 outputs so the DuckDB oracle hash-compares:
  * the real system swaps the scoring column (a reward-model score) and
  * the rendered line body (actual message text) without changing the
  * plan shape.
  */
object SftQueries {

  /** Chat-template rendering: each (user, day) is one conversation; its
    * events, ordered by (ts, event_id), become alternating user/assistant
    * turns ("role: event_type #event_id"), joined with newlines into one
    * transcript. Output is (user_id, day, n_turns, transcript_md5).
    *
    * Scale shape: ONE shuffle on the conversation key — the row_number
    * window and the groupBy share the (user_id, day) partitioning, so
    * Catalyst reuses the exchange. collect_list order is made
    * deterministic by sorting the collected (rn, line) structs, never by
    * trusting arrival order (which is partition-race-dependent on a
    * cluster). Conversations are user-days: bounded fan-in, no skew
    * beyond the busiest user-day. */
  def chatTemplate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"), col("event_type"))
    val w = Window.partitionBy("user_id", "day")
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("rn", row_number().over(w))
      .withColumn("line", concat(
        when(col("rn") % 2 === 1, lit("user: ")).otherwise(lit("assistant: ")),
        col("event_type"), lit(" #"), col("event_id")))
      .groupBy("user_id", "day")
      .agg(
        count(lit(1)).as("n_turns"),
        md5(concat_ws("\n",
          transform(array_sort(collect_list(struct(col("rn"), col("line")))),
            s => s.getField("line")))).as("transcript_md5"))
      .orderBy("user_id", "day")
  }

  /** Preference-pair construction per prompt cohort (source, lang): the
    * top-ranked candidate becomes `chosen`, the bottom-ranked `rejected`,
    * with the score margin. The ranking column here is n_chars (integer,
    * so the oracle is exact); a real pipeline substitutes a reward-model
    * score without changing the plan. Cohorts of one are dropped — no
    * pair exists.
    *
    * Scale shape: one shuffle on the cohort key; the two opposite-order
    * row_number windows and the final groupBy all share the
    * (source, lang) partitioning (one exchange, three sorts), and the
    * output is O(cohorts), never O(docs²) — the pair is picked by rank,
    * not by pairwise comparison. */
  def preferencePairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), col("lang"), col("doc_id"), col("n_chars"))
    val best = Window.partitionBy("source", "lang")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val worst = Window.partitionBy("source", "lang")
      .orderBy(col("n_chars").asc, col("doc_id").desc)
    docs
      .withColumn("rb", row_number().over(best))
      .withColumn("rw", row_number().over(worst))
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_candidates"),
        max(when(col("rb") === 1, col("doc_id"))).as("chosen_id"),
        max(when(col("rw") === 1, col("doc_id"))).as("rejected_id"),
        max(when(col("rb") === 1, col("n_chars"))).as("chosen_chars"),
        max(when(col("rw") === 1, col("n_chars"))).as("rejected_chars"))
      .filter(col("n_candidates") >= 2)
      .select(col("source"), col("lang"), col("n_candidates"),
        col("chosen_id"), col("rejected_id"),
        (col("chosen_chars") - col("rejected_chars")).as("margin_chars"))
      .orderBy("source", "lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q165_chat_template" -> (chatTemplate _),
    "q166_preference_pairs" -> (preferencePairs _))

  val oracles: Map[String, String] = Map(
    // same (ts, event_id) turn order, same role parity, same newline join
    "q165_chat_template" ->
      """WITH t AS (
           SELECT user_id, CAST(ts AS DATE) AS day, event_id, event_type,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts, event_id) AS rn
           FROM events)
         SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_turns,
           md5(string_agg(
             (CASE WHEN rn % 2 = 1 THEN 'user: ' ELSE 'assistant: ' END)
               || event_type || ' #' || event_id,
             chr(10) ORDER BY rn)) AS transcript_md5
         FROM t GROUP BY user_id, day ORDER BY user_id, day""",
    // same rank tiebreaks: best = (chars DESC, id ASC), worst = (chars
    // ASC, id DESC) — all-equal cohorts still yield a distinct pair
    "q166_preference_pairs" ->
      """WITH r AS (
           SELECT source, lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY source, lang
               ORDER BY n_chars DESC, doc_id ASC) AS rb,
             row_number() OVER (PARTITION BY source, lang
               ORDER BY n_chars ASC, doc_id DESC) AS rw
           FROM documents)
         SELECT source, lang, CAST(count(*) AS BIGINT) AS n_candidates,
           max(CASE WHEN rb = 1 THEN doc_id END) AS chosen_id,
           max(CASE WHEN rw = 1 THEN doc_id END) AS rejected_id,
           max(CASE WHEN rb = 1 THEN n_chars END)
             - max(CASE WHEN rw = 1 THEN n_chars END) AS margin_chars
         FROM r GROUP BY source, lang HAVING count(*) >= 2
         ORDER BY source, lang""")
}
