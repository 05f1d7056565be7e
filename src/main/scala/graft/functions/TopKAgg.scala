package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Bounded "k smallest longs" aggregation buffer: a sorted array of at most
 * `k` values (k is small — the kNN stack-dedup bound), linear insertion.
 */
final class LongTopK(val k: Int) {
  private[functions] val vals = new Array[Long](k)
  private[functions] var n = 0

  def add(v: Long): Unit = {
    if (n == k && v >= vals(n - 1)) return
    var i = if (n == k) n - 1 else { n += 1; n - 1 }
    // shift larger values right, insert v in sorted position
    while (i > 0 && vals(i - 1) > v) { vals(i) = vals(i - 1); i -= 1 }
    vals(i) = v
  }

  def addAll(o: LongTopK): Unit = {
    var i = 0
    while (i < o.n) { add(o.vals(i)); i += 1 }
  }

  def result: Array[Long] = java.util.Arrays.copyOf(vals, n)

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(vals(i)); i += 1 }
    bb.array()
  }
}

object LongTopK {
  def fromBytes(k: Int, bytes: Array[Byte]): LongTopK = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new LongTopK(k)
    val m = bb.getInt
    var i = 0
    while (i < m) { b.vals(i) = bb.getLong; i += 1 } // already sorted
    b.n = m
    b
  }
}

/**
 * `topk_min(v, k)` — the k SMALLEST values of a long column per group, as a
 * sorted array. A TypedImperativeAggregate, so it participates in partial
 * (map-side) aggregation: each map task emits at most k values per group
 * key instead of every row.
 *
 * Motivation (kNN co-located-stack dedup, SpatialJoins.prepareKnnTargets):
 * the r02 plan ranked stacks with a row_number window — ONE exchange of
 * every hot-cell row followed by a per-reducer sort. At 1B points that is
 * a ~300M-row / multi-GB sort-shuffle whose spill behavior swung the
 * measured job time 2x between identical runs. As a bounded aggregate the
 * same semantics cost one pass: the exchange carries <= stacks x k rows
 * and nothing sorts more than k elements at a time.
 *
 * Scale note: TypedImperativeAggregate plans as ObjectHashAggregate, which
 * falls back to sort-based aggregation beyond
 * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct keys
 * per task (default 128 — raise it when group cardinality per task is
 * large; the fallback is correct either way, and even sort-based partial
 * aggregation shuffles only the k survivors per group).
 */
case class TopKMinLongs(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongTopK] {
  require(k >= 1 && k <= 65536, s"topk_min: k=$k out of range [1, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): LongTopK = new LongTopK(k)

  override def update(buffer: LongTopK, input: InternalRow): LongTopK = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: LongTopK, other: LongTopK): LongTopK = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: LongTopK): Any = new GenericArrayData(buffer.result)

  override def serialize(buffer: LongTopK): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): LongTopK =
    LongTopK.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKMinLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKMinLongs =
    copy(inputAggBufferOffset = o)

  override def prettyName: String = "topk_min"
}
