package graft.functions

import java.util.BitSet

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact distinct count over dense non-negative integer ids via a bitmap
  * buffer — the warehouse-standard alternative when `COUNT(DISTINCT)` must
  * be exact but a shuffle-dedup pass is too expensive (SURVEY.md §2.8
  * extension scope; the aggregate rung of the extension ladder next to the
  * scalar [[DotProductF]]).
  *
  * Scale shape: `COUNT(DISTINCT x)` plans an Expand + extra shuffle of the
  * distinct pairs; this aggregate keeps ONE mergeable bitmap per group per
  * partition (map-side partial), and merge is a bitwise OR — the same
  * single-pass shape as `approx_count_distinct`, but exact. Memory is
  * O(max_id/8) per group, which is the explicit trade: right for dense id
  * domains (user ids, surrogate keys), wrong for sparse 64-bit hashes —
  * production systems swap the dense BitSet for a Roaring bitmap; the
  * aggregate contract here is identical.
  */
case class BitmapDistinct(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitSet] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): BitSet = new BitSet()

  override def update(buf: BitSet, input: InternalRow): BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      require(id >= 0 && id <= Int.MaxValue,
        s"bitmap_distinct requires dense ids in [0, 2^31): got $id")
      buf.set(id.toInt)
    }
    buf
  }

  override def merge(a: BitSet, b: BitSet): BitSet = { a.or(b); a }

  override def eval(buf: BitSet): Any = buf.cardinality().toLong

  override def serialize(buf: BitSet): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): BitSet = BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object BitmapDistinct {
  /** Column-API entry: `agg(bitmapDistinct(col("user_id")))`. */
  def bitmapDistinct(c: Column): Column =
    GraftShims.column(
      BitmapDistinct(GraftShims.expression(c.cast("long")))
        .toAggregateExpression())
}
