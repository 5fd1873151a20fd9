package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point query against a serialized Count-Min sketch (the binary produced by
  * Spark's `count_min_sketch` aggregate): `cms_estimate(sketch, item)` →
  * upper-bound frequency estimate of `item`. Codegen via a static helper.
  *
  * The deserialization happens per evaluation — correct for the rollup shape
  * this serves (a handful of probe rows against per-stratum sketches). A
  * probe of millions of items against ONE sketch should broadcast the
  * deserialized sketch instead (same pattern as the ANN query side).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sk: Any, item: Any): Any =
    CmsEstimate.estimate(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, i) =>
      s"${ev.value} = graft.functions.CmsEstimate.estimate($s, $i);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  /** Static body shared by eval and generated code. */
  def estimate(bytes: Array[Byte], item: Long): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      .estimateCount(java.lang.Long.valueOf(item))
}
