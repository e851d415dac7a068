package graft.functions

import java.util.BitSet

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}

import scala.util.hashing.MurmurHash3

/** Mergeable Bloom-filter aggregate — the per-file index behind
  * [[graft.layout.DataSkipping]]'s equality pruning (Delta's Bloom-filter
  * index / Parquet's bloom pages play the same role: min/max skipping is
  * blind on high-cardinality columns whose values interleave across files,
  * a per-file Bloom answers "definitely absent" for an exact key).
  *
  * Same extension rung as [[BitmapDistinct]]: a TypedImperativeAggregate
  * whose partial state merges with bitwise OR, so stats collection is one
  * map-side-combined pass — the shuffle carries `numBits/8` bytes per file,
  * never the data. Membership uses Kirsch–Mitzenstein double hashing
  * (`h1 + i·h2 mod m`) over Murmur3 of the value's canonical string
  * rendering; [[BloomAgg.mightContain]] replays the same probes driver-side
  * against the serialized bits, so a filter built on executors is readable
  * anywhere without the class.
  *
  * False-positive rate for n values: `(1 - e^(-k·n/m))^k` — the default
  * 64 Kbit / 7-hash filter holds ~6.5k values per file at ~1% FPR.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitSet] {

  require(numBits >= 64 && numHashes >= 1,
    s"bloom needs numBits >= 64 and numHashes >= 1, got $numBits/$numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BitSet = new BitSet(numBits)

  override def update(buf: BitSet, input: InternalRow): BitSet = {
    val v = child.eval(input)
    if (v != null) BloomAgg.set(buf, v.toString, numBits, numHashes)
    buf
  }

  override def merge(a: BitSet, b: BitSet): BitSet = { a.or(b); a }

  override def eval(buf: BitSet): Any = {
    // pad to the full bit width so every file's filter serializes to the
    // same length regardless of which bits happen to be set
    buf.set(numBits) // sentinel one past the filter range
    buf.toByteArray
  }

  override def serialize(buf: BitSet): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): BitSet = BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object BloomAgg {
  val DefaultBits = 1 << 16
  val DefaultHashes = 7

  /** Column-API entry: values are canonicalized through `cast(string)` so
    * probe-side rendering ([[mightContain]] on `v.toString`) agrees with
    * build-side rendering for strings, integers, dates and decimals. */
  def bloomAgg(c: Column, numBits: Int = DefaultBits,
      numHashes: Int = DefaultHashes): Column =
    GraftShims.column(
      BloomAgg(GraftShims.expression(c.cast("string")), numBits, numHashes)
        .toAggregateExpression())

  private def probes(s: String, numBits: Int, numHashes: Int): Array[Int] = {
    val bytes = s.getBytes("UTF-8")
    val h1 = MurmurHash3.bytesHash(bytes, 0x9747b28c)
    val h2 = MurmurHash3.bytesHash(bytes, 0x5bd1e995) | 1 // odd stride
    Array.tabulate(numHashes) { i =>
      val h = h1 + i * h2
      math.floorMod(h, numBits)
    }
  }

  private def set(buf: BitSet, s: String, numBits: Int, numHashes: Int): Unit =
    probes(s, numBits, numHashes).foreach(buf.set)

  /** Driver-side probe of a serialized filter (as [[BloomAgg.eval]] emits
    * it). False = the value is definitely not in the file. */
  def mightContain(bits: Array[Byte], s: String, numBits: Int,
      numHashes: Int): Boolean = {
    val bs = BitSet.valueOf(bits)
    probes(s, numBits, numHashes).forall(bs.get)
  }
}
