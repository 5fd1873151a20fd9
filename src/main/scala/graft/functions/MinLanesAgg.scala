package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Element-wise minimum over Broder's affine MinHash lane family, folded as
  * a single `TypedImperativeAggregate`: each input row carries the two
  * 48-bit md5 halves (b0, b1) of ONE shingle, and the buffer keeps
  * min over rows of h_l = ((2l+1)·b0 + b1) mod 2^48 for every lane l —
  * `lanes` longs of state per group, updated by a tight JVM loop.
  *
  * This replaces the explode-by-lane formulation (|shingles|×lanes rows
  * through a hash aggregate) with |shingles| rows and zero intermediate
  * row blowup — measured 64× input-volume reduction for the x58/s52
  * signature build. All intermediates stay below 2^55, so the arithmetic
  * is overflow-free and agrees bit-exactly with the DuckDB oracle's
  * BIGINT replay (BIGINT multiply overflow RAISES in DuckDB but silently
  * wraps in Spark — the bound is load-bearing).
  *
  * Deterministic and mergeable: min is commutative/associative/idempotent,
  * so the result is independent of partitioning, merge order, and
  * duplicate shingles — streaming-legal (s52 runs it in complete mode).
  */
case class MinLanesAgg(b0: Expression, b1: Expression, lanes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(lanes > 0 && lanes <= 128,
    s"affine family bound: (2*$lanes-1)*2^48 must stay < 2^63")

  private val Mask = (1L << 48) - 1

  override def children: Seq[Expression] = Seq(b0, b1)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_lanes"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(lanes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v0 = b0.eval(input)
    val v1 = b1.eval(input)
    if (v0 != null && v1 != null) {
      val x0 = v0.asInstanceOf[Long]
      val x1 = v1.asInstanceOf[Long]
      var l = 0
      while (l < lanes) {
        val h = ((2L * l + 1L) * x0 + x1) & Mask
        if (h < buf(l)) buf(l) = h
        l += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var l = 0
    while (l < lanes) {
      if (other(l) < buf(l)) buf(l) = other(l)
      l += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * lanes)
    var l = 0
    while (l < lanes) { bb.putLong(buf(l)); l += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](lanes)
    var l = 0
    while (l < lanes) { buf(l) = bb.getLong; l += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinLanesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinLanesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(b0 = newChildren(0), b1 = newChildren(1))
}
