package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.merge.{MergeEngine, PartitionedMerge, SurrogateKeys}

/** The gold-layer load protocol — first load creates the table with its
  * audit columns, every later run merges (partition-pruned when bucketed) —
  * extracted so the imperative [[Medallion]] methods and the declarative
  * [[PipelineGraph]] materializers execute ONE implementation: parity
  * between the two surfaces holds by construction (and is still
  * spec-asserted end to end). */
private[graft] object GoldLoad {

  def read(spark: SparkSession, cat: Catalog, dimBuckets: Option[Int],
      table: String): DataFrame = dimBuckets match {
    case Some(_) => PartitionedMerge.read(spark, cat.path("gold", table))
    case None => cat.read("gold", table)
  }

  private def create(spark: SparkSession, cat: Catalog,
      dimBuckets: Option[Int], df: DataFrame, table: String,
      keys: Seq[String]): Unit = dimBuckets match {
    case Some(n) => PartitionedMerge.write(df, cat.path("gold", table), keys, n)
    case None => cat.create(df, "gold", table)
  }

  private def merge(spark: SparkSession, cat: Catalog,
      dimBuckets: Option[Int], table: String, source: DataFrame,
      keys: Seq[String])(fn: (DataFrame, DataFrame) => DataFrame): Unit =
    dimBuckets match {
      case Some(n) =>
        PartitionedMerge.prunedMerge(spark, cat.path("gold", table),
          source, keys, n)(fn)
        ()
      case None =>
        cat.overwriteSnapshot(
          fn(read(spark, cat, dimBuckets, table), source), "gold", table)
    }

  /** SCD1 load (Gold_Customers.py shape). Returns the committed table. */
  def scd1(spark: SparkSession, cat: Catalog, dimBuckets: Option[Int],
      table: String, source: DataFrame, keys: Seq[String],
      tracked: Seq[String], skeyCol: String, now: Column): DataFrame = {
    if (!cat.exists("gold", table)) {
      val initial = SurrogateKeys.assign(source, skeyCol, keys)
        .withColumn("created_date", now)
        .withColumn("updated_date", now)
        .withColumn("change_type", lit("I"))
        .withColumn("hash_value", MergeEngine.nullSafeHash(tracked.map(col)))
      create(spark, cat, dimBuckets, initial, table, keys)
    } else {
      merge(spark, cat, dimBuckets, table, source, keys) { (t, s) =>
        MergeEngine.scd1(t, s, keys, tracked, skeyCol, now,
          skeyBase = Some(read(spark, cat, dimBuckets, table)))
      }
    }
    read(spark, cat, dimBuckets, table)
  }

  /** SCD2 load (Gold_Products.py shape). Returns the committed table. */
  def scd2(spark: SparkSession, cat: Catalog, dimBuckets: Option[Int],
      table: String, source: DataFrame, keys: Seq[String],
      tracked: Seq[String], skeyCol: String, now: Column): DataFrame = {
    if (!cat.exists("gold", table)) {
      val initial = SurrogateKeys.assign(source, skeyCol, keys)
        .withColumn("hash_value", MergeEngine.nullSafeHash(tracked.map(col)))
        .withColumn("effective_start_date", now)
        .withColumn("effective_end_date", lit(null).cast("timestamp"))
        .withColumn("is_current", lit(true))
        .withColumn("insert_date", now)
        .withColumn("update_date", now)
      create(spark, cat, dimBuckets, initial, table, keys)
    } else {
      merge(spark, cat, dimBuckets, table, source, keys) { (t, s) =>
        MergeEngine.scd2(t, s, keys, tracked, skeyCol, now,
          skeyBase = Some(read(spark, cat, dimBuckets, table)))
      }
    }
    read(spark, cat, dimBuckets, table)
  }

  /** Fact upsert load (Gold_Orders.py shape). Returns the committed table. */
  def upsert(spark: SparkSession, cat: Catalog, dimBuckets: Option[Int],
      table: String, source: DataFrame, keys: Seq[String],
      now: Column): DataFrame = {
    if (!cat.exists("gold", table)) {
      create(spark, cat, dimBuckets,
        source.withColumn("created_dt", now).withColumn("updated_dt", now),
        table, keys)
    } else {
      merge(spark, cat, dimBuckets, table, source, keys) { (t, s) =>
        MergeEngine.upsert(t, s, keys, now)
      }
    }
    read(spark, cat, dimBuckets, table)
  }
}
