package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}

/** Z-order (Morton-curve) data clustering — the layout half of Delta's
  * `OPTIMIZE ... ZORDER BY` (reference workload: Databricks tables are
  * OPTIMIZEd so multi-dimensional point/range scans skip files). Rows
  * whose clustering columns are close land in the same output file, so
  * every file's per-column min/max footer range is TIGHT on ALL clustered
  * columns at once — a filter on any of them prunes most files, which a
  * single-column sort only delivers for its leading column.
  *
  * Mechanics, chosen for 100 TB:
  *  - each column is linearly scaled to a `bits`-wide integer between its
  *    global min and max — ONE tiny aggregate job for the whole column
  *    set, no global sort, no driver-sized state;
  *  - the scaled values are bit-INTERLEAVED into the Morton z-value, a
  *    pure codegen'd integer expression (shift/and/or terms — no UDF);
  *  - `repartitionByRange` on the z-value (sampled range exchange —
  *    distributed, one shuffle) + `sortWithinPartitions` makes both the
  *    file boundaries and the parquet row-group stats follow the curve.
  *
  * Linear min/max scaling trades skew-adaptivity for never needing a
  * quantile pass: heavily skewed columns cluster less evenly than Delta's
  * range-id variant but the plan stays two jobs (agg + shuffled write) at
  * any scale. */
object ZOrder {

  /** Interleave `bits` low bits of each (already scaled, non-negative)
    * column: result bit `i*n + j` = bit `i` of `scaled(j)`. Total bits
    * must fit a long's positive range. */
  def interleave(scaled: Seq[Column], bits: Int): Column = {
    require(scaled.nonEmpty, "need at least one column")
    val n = scaled.size
    require(n * bits <= 62, s"$n cols x $bits bits overflow a long")
    val terms = for {
      i <- 0 until bits
      (c, j) <- scaled.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** `c` scaled linearly from [lo, hi] to [0, 2^bits - 1] as a long;
    * nulls map to 0 (they cluster together at the curve's origin). */
  def scaleToBits(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    val maxV = (1L << bits) - 1
    coalesce(least(greatest(
      floor((c.cast("double") - lo) / span * maxV).cast("long"),
      lit(0L)), lit(maxV)), lit(0L))
  }

  /** The z-value column for `cols` of `df`, scaling each column by its
    * global min/max (one aggregate job). Numeric, timestamp and date
    * columns cluster by value; anything else (strings) clusters by
    * xxhash64 — no locality, but mixed column lists still work. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    val keyed = cols.map { name =>
      df.schema(name).dataType match {
        case _: NumericType | TimestampType | DateType =>
          name -> col(name).cast("double")
        case _ => name -> xxhash64(col(name)).cast("double")
      }
    }
    val aggs = keyed.flatMap { case (n, c) =>
      Seq(min(c).as(s"__lo_$n"), max(c).as(s"__hi_$n")) }
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val scaled = keyed.zipWithIndex.map { case ((_, c), i) =>
      // all-null column -> null min/max -> degenerate [0,0] range
      val lo = if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i)
      val hi = if (stats.isNullAt(2 * i + 1)) 0.0 else stats.getDouble(2 * i + 1)
      scaleToBits(c, lo, hi, bits)
    }
    interleave(scaled, bits)
  }

  /** `df` redistributed into `nPartitions` z-clustered partitions, rows
    * z-sorted within each so parquet row-group stats follow the curve. */
  def cluster(df: DataFrame, cols: Seq[String], nPartitions: Int,
      bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "ZORDER BY needs at least one column")
    val zc = "__graft_z"
    df.withColumn(zc, zValue(df, cols, bits))
      .repartitionByRange(math.max(nPartitions, 1), col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }
}
