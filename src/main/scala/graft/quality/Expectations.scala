package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations (SURVEY.md §2.9 T7) — the vanilla-Spark
  * equivalent of DLT's `expect_all_or_drop` (Gold_Products.py:71-74,82):
  * named SQL predicates; violating rows are dropped (or the batch failed),
  * and per-rule violation counts are collected in ONE aggregate pass
  * (`sum(when(!rule,1))`) rather than one job per rule.
  */
object Expectations {

  final case class Result(kept: DataFrame, input: DataFrame,
      rules: Map[String, String]) {
    /** Per-rule violation counts — an action; call when metrics are needed. */
    def violations: Map[String, Long] = violationCounts(input, rules)
  }

  private def parsed(rules: Map[String, String]): Map[String, Column] =
    rules.map { case (n, sql) => n -> expr(sql) }

  /** Drop mode: keep rows satisfying EVERY rule. The result is lazy — no
    * job runs until `kept` is acted on or `violations` is asked for. */
  def applyOrDrop(df: DataFrame, rules: Map[String, String]): Result =
    Result(df.filter(parsed(rules).values.reduce(_ && _)), df, rules)

  /** Fail mode (DLT `expect_all_or_fail`): throw if any rule is violated. */
  def applyOrFail(df: DataFrame, rules: Map[String, String]): DataFrame = {
    val bad = violationCounts(df, rules).filter(_._2 > 0)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"expectations violated: ${bad.map { case (k, v) => s"$k=$v" }.mkString(", ")}")
    df
  }

  /** A row violates a rule when the predicate is NOT TRUE — the same
    * three-valued-logic rule the drop filter applies (filter keeps only
    * TRUE), so a NULL-evaluating row is both dropped AND counted. Bare
    * `!rule` would let it be dropped silently: NULL falls out of `rule`
    * and `!rule` alike. */
  private def violates(sql: String): Column =
    !coalesce(expr(sql), lit(false))

  /** One-pass per-rule violation counts (conditional aggregates — the
    * SURVEY §2.4 DQ-counting shape). */
  def violationCounts(df: DataFrame, rules: Map[String, String]): Map[String, Long] = {
    if (rules.isEmpty) return Map.empty
    val aggs = rules.map { case (n, sql) =>
      sum(when(violates(sql), 1L).otherwise(0L)).as(n)
    }.toSeq
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    rules.keys.zipWithIndex.map { case (n, i) =>
      n -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }.toMap
  }

  /** Quarantine mode (the DLT-recommended pattern for rows too valuable
    * to silently drop): split one pass into (clean, quarantined) where
    * the quarantined frame carries a `_violated_rules` array naming each
    * failed rule — the triage surface a data-quality dashboard reads.
    * NULL-evaluating rows quarantine (the same three-valued-logic rule
    * as drop mode). The split is lazy; writing both sides costs one scan
    * each (or cache the input for one total).
    *
    * Scale shape: two codegen'd filters over the same scan — no shuffle,
    * no second counting job; the per-rule flags are one projection. */
  def applyOrQuarantine(df: DataFrame, rules: Map[String, String])
      : (DataFrame, DataFrame) = {
    val ok = parsed(rules).values.map(c => coalesce(c, lit(false)))
      .reduce(_ && _)
    val flags = rules.toSeq.sortBy(_._1).map { case (n, sql) =>
      when(violates(sql), n)
    }
    val quarantined = df.filter(!ok)
      .withColumn("_violated_rules",
        array_compact(array(flags: _*)).cast("array<string>"))
    (df.filter(ok), quarantined)
  }

  /** Monitor mode (DLT `expect`): keep EVERY row, surface per-rule
    * violation counts as OBSERVED metrics computed inside the query's own
    * execution — on a stream they arrive per micro-batch in
    * `StreamingQueryProgress.observedMetrics(name)` with no second pass
    * over the data (a stream cannot be re-read for a counting job; a
    * 100 TB batch should not be). Row-count rides along so rates are
    * computable downstream. */
  def observeMetrics(df: DataFrame, name: String,
      rules: Map[String, String]): DataFrame = {
    val aggs = rules.toSeq.sortBy(_._1).map { case (n, sql) =>
      sum(when(violates(sql), 1L).otherwise(0L)).as(n)
    } :+ count(lit(1)).as("rows_seen")
    df.observe(name, aggs.head, aggs.tail: _*)
  }
}
