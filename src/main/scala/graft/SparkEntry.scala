package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module contributes a registry of named queries (DataFrame programs
  * over the testdata tables) and, where ANSI-SQL-expressible, an equivalent
  * DuckDB oracle. The driver hash-compares the two at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The Silver-Orders ranking-window flagship (SURVEY §7.1). */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.windowRank(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
    operators.TpchSuite.queries ++
    functions.Udfs.queries ++
    operators.MergeQueries.queries ++
    operators.EventQueries.queries ++
    operators.OlapQueries.queries ++
    operators.TextQueries.queries ++
    operators.PrivacyQueries.queries ++
    operators.MixQueries.queries ++
    operators.Dedup.queries ++
    operators.Similarity.queries ++
    operators.SkewQueries.queries ++
    operators.SearchQueries.queries ++
    operators.GraphQueries.queries ++
    operators.SftQueries.queries ++
    operators.EvalQueries.queries ++
    operators.LmQueries.queries ++
    operators.SketchQueries.queries ++
    multimodal.Multimodal.queries ++
    multimodal.Audio.queries ++
    sources.Formats.queries ++
    layout.DataSkipping.queries ++
    layout.BucketedDml.queries ++
    layout.FileGranularDml.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
    operators.TpchSuite.oracles ++
    functions.Udfs.oracles ++
    operators.MergeQueries.oracles ++
    operators.EventQueries.oracles ++
    operators.OlapQueries.oracles ++
    operators.TextQueries.oracles ++
    operators.PrivacyQueries.oracles ++
    operators.MixQueries.oracles ++
    operators.Dedup.oracles ++
    operators.Similarity.oracles ++
    operators.SkewQueries.oracles ++
    operators.SearchQueries.oracles ++
    operators.GraphQueries.oracles ++
    operators.SftQueries.oracles ++
    operators.EvalQueries.oracles ++
    operators.LmQueries.oracles ++
    operators.SketchQueries.oracles ++
    multimodal.Multimodal.oracles ++
    multimodal.Audio.oracles ++
    sources.Formats.oracles ++
    layout.DataSkipping.oracles ++
    layout.BucketedDml.oracles ++
    layout.FileGranularDml.oracles
}
