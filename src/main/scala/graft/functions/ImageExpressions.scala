package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `avg_hash64(imageBytes)` — the classic average-hash (aHash) perceptual
  * image fingerprint, DCT-free: block-average the payload down to an 8×8
  * luminance grid (64 cells), then set bit i when cell i is brighter than
  * the grid mean. Two perceptually-near images differ in few bits, so
  * near-duplicate detection is a small-Hamming-distance search — which the
  * simhash banding infrastructure already solves at scale.
  *
  * The container has no image codecs, so the "decode to grayscale" step is
  * the identity over the raw payload bytes (a deterministic stand-in); the
  * block-averaging IS the real aHash resize step, and every downstream part
  * (banding, Hamming verify, pair semantics) is the production operator.
  * Codegen via a static helper; one pass over the payload per row. */
case class AvgHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "avg_hash64"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(BinaryType)

  override def nullSafeEval(v: Any): Any =
    AvgHash64.hash(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AvgHash64.hash($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object AvgHash64 {
  /** Static body shared by eval and generated code. */
  def hash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val cells = new Array[Double](64)
    var i = 0
    while (i < 64) {
      // block boundaries in 64ths of the payload — the 8×8 "resize"
      val lo = (i.toLong * n / 64).toInt
      var hi = ((i + 1).toLong * n / 64).toInt
      if (hi <= lo) hi = math.min(n, lo + 1)
      var s = 0L
      var j = lo
      while (j < hi) { s += (bytes(j) & 0xff); j += 1 }
      cells(i) = s.toDouble / (hi - lo)
      i += 1
    }
    var mean = 0.0
    i = 0
    while (i < 64) { mean += cells(i); i += 1 }
    mean /= 64.0
    var h = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }
}
