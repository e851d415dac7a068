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

  /** One-pass per-rule violation counts (conditional aggregates — the
    * SURVEY §2.4 DQ-counting shape). */
  def violationCounts(df: DataFrame, rules: Map[String, String]): Map[String, Long] = {
    if (rules.isEmpty) return Map.empty
    val aggs = rules.map { case (n, sql) =>
      sum(when(!expr(sql), 1L).otherwise(0L)).as(n)
    }.toSeq
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    rules.keys.zipWithIndex.map { case (n, i) =>
      n -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }.toMap
  }
}
