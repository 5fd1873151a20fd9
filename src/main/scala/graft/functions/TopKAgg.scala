package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact top-k values per group as a `TypedImperativeAggregate` — the
  * binary-state UDAF extension lane (SURVEY.md §2.3: "TypedImperativeAggregate
  * for binary state like sketches"). The buffer is a bounded min-heap of the
  * k largest doubles; partial states serialize to a flat byte image and merge
  * by re-insertion, so map-side combine works like any sketch: O(k) state per
  * group regardless of group size — at 100 TB the shuffle carries k doubles
  * per group, never the raw values (contrast collect_list + slice, whose
  * state is the whole group).
  *
  * Deterministic: the result is the multiset of the k largest values sorted
  * descending — independent of partitioning and merge order.
  */
case class TopKAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]] {

  require(k > 0 && k <= (1 << 20), "k must be in 1..2^20")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "topk_vals"

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  private def insert(q: java.util.PriorityQueue[java.lang.Double], v: Double): Unit = {
    if (q.size < k) q.add(v)
    else if (q.peek() < v) { q.poll(); q.add(v) }
  }

  override def update(q: java.util.PriorityQueue[java.lang.Double],
      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) insert(q, v.asInstanceOf[Number].doubleValue())
    q
  }

  override def merge(q: java.util.PriorityQueue[java.lang.Double],
      other: java.util.PriorityQueue[java.lang.Double])
      : java.util.PriorityQueue[java.lang.Double] = {
    other.forEach(v => insert(q, v))
    q
  }

  override def eval(q: java.util.PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](q.size)
    var i = arr.length - 1
    while (i >= 0) { arr(i) = q.poll(); i -= 1 } // heap pops ascending → fill back-to-front
    new GenericArrayData(arr)
  }

  override def serialize(q: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * q.size)
    bb.putInt(q.size)
    q.forEach(v => bb.putDouble(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { insert(q, bb.getDouble); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
