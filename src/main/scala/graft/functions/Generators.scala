package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UDTF (the `Generator` extension point of SURVEY.md §2.3): explodes a text
  * column into `(pos, shingle)` rows of k-gram word shingles in one pass —
  * the generator form of [[graft.GraftOps.shingles]], for pipelines that want
  * positions (e.g. winnowing-style locality) without materializing the
  * intermediate array column. Catalyst plans it through the same `Generate`
  * node as `explode`.
  *
  * CodegenFallback is deliberate here, not a gap: `GenerateExec` only has a
  * codegen path for the built-in explode/inline family (`CollectionGenerator`)
  * and runs every other `Generator` — including Spark's own `JsonTuple` and
  * `Stack` — through eval. The per-row cost is one varargs-free eval call
  * producing an iterator, which the generate loop consumes outside
  * whole-stage codegen regardless. */
case class ShingleGenerator(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k > 0, "k must be positive")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val words = v.asInstanceOf[UTF8String].toString.split(" ")
    if (words.length < k)
      return Seq(new GenericInternalRow(Array[Any](0,
        UTF8String.fromString(words.mkString(" ")))))
    (0 to words.length - k).iterator.map { i =>
      new GenericInternalRow(Array[Any](i,
        UTF8String.fromString(words.slice(i, i + k).mkString(" ")))): InternalRow
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
