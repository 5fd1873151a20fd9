package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable aggregation buffer: running component sums + count. */
case class CentroidBuf(sums: Array[Double], n: Long)

/** UDAF (the `Aggregator[IN, BUF, OUT]` extension point of SURVEY.md §2.3):
  * element-wise mean of `array<float>` embeddings — the centroid builder for
  * the IVF similarity index (X03 scale path). Merge is associative and
  * commutative, so Spark computes partition-local partials and merges them on
  * the reduce side (map-side combine for vectors). */
class CentroidAgg(dim: Int) extends Aggregator[Array[Float], CentroidBuf, Array[Float]] {
  override def zero: CentroidBuf = CentroidBuf(new Array[Double](dim), 0L)

  override def reduce(b: CentroidBuf, v: Array[Float]): CentroidBuf = {
    if (v != null) {
      var i = 0
      val m = math.min(dim, v.length)
      while (i < m) { b.sums(i) += v(i); i += 1 }
      CentroidBuf(b.sums, b.n + 1)
    } else b
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    CentroidBuf(a.sums, a.n + b.n)
  }

  override def finish(b: CentroidBuf): Array[Float] = {
    val out = new Array[Float](dim)
    if (b.n > 0) {
      var i = 0
      while (i < dim) { out(i) = (b.sums(i) / b.n).toFloat; i += 1 }
    }
    out
  }

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
}
