package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` computing a component-wise vector mean
  * (centroid) over `Array[Float]` embeddings — the user-facing typed
  * aggregation API (SURVEY.md §2.8 extension scope), complementing the
  * Catalyst-level [[BitmapDistinct]].
  *
  * Buffer is (component double sums, count): mergeable across partitions
  * like any map-side-combined aggregate, O(dim) memory. Used as
  * `ds.groupByKey(...).agg(VectorMean.toColumn)` or via
  * `udaf(VectorMean)` registration for the untyped API.
  */
object VectorMean extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v == null) b
    else {
      val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      var i = 0
      val n = math.min(sums.length, v.length)
      while (i < n) { sums(i) += v(i); i += 1 }
      (sums, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      val n = math.min(a._1.length, b._1.length)
      while (i < n) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) Array.empty[Double] else r._1.map(_ / r._2)

  // Catalyst-native encoders (tungsten rows, no JVM serialization)
  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.product[(Array[Double], Long)]

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
