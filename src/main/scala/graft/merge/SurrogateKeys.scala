package graft.merge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Durable surrogate-key allocation (SURVEY.md §7.3).
  *
  * The reference uses `monotonically_increasing_id()` (Gold_Customers.py:34,
  * Gold_Products_No_Delta_Live.py:49), which renumbers on every run — the
  * fact↔dim join only works there because MERGE never updates the key
  * (§2.10.9). Durable keys = `max(existing) + dense sequence over inserts`.
  *
  * Two implementations:
  *  - `assignSmallBatch`: row_number over a global window — one-partition
  *    sort, correct and simple; for insert batches (the common merge case).
  *  - `assign`: sort + zipWithIndex — the sequence is computed per-partition
  *    with partition-size offsets (two narrow passes, no single-partition
  *    shuffle), so it scales to billion-row initial loads where the window
  *    variant would serialize on one task.
  */
object SurrogateKeys {

  def assignSmallBatch(df: DataFrame, skeyCol: String, orderCols: Seq[String],
      start: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderCols.map(col): _*)
    df.withColumn(skeyCol, (lit(start) + row_number().over(w)).cast(LongType))
  }

  def assign(df: DataFrame, skeyCol: String, orderCols: Seq[String],
      start: Long = 0L): DataFrame = {
    val sorted = df.repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val withIdx = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (start + i + 1L))
    }
    val schema = StructType(sorted.schema.fields :+
      StructField(skeyCol, LongType, nullable = false))
    sorted.sparkSession.createDataFrame(withIdx, schema)
  }
}
