package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-normalization expressions — the canonicalization a
  * dedup-robust pipeline runs BEFORE fingerprinting: the same visible text
  * can arrive as different byte sequences (decomposed vs precomposed
  * accents), and md5/shingle/MinHash identity breaks on the bytes, not the
  * glyphs. Spark ships neither; both exist in DuckDB (`nfc_normalize`,
  * `strip_accents`), which makes them exactly oracle-checkable. JDK
  * `java.text.Normalizer` is the implementation — Unicode-conformant,
  * public, no dependency. */
object UnicodeKernels {
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** NFD + drop non-spacing marks: café→cafe, Ångström→Angstrom; base
    * letters without decompositions (ß, Đ) stay — byte-identical to
    * DuckDB's `strip_accents` on combining-mark accents. */
  def stripAccents(s: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val ch = d.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `nfc_normalize(s)` — Unicode canonical composition (NFC). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(v: Any): Any =
    UnicodeKernels.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.nfc($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `strip_accents(s)` — NFD decomposition with combining marks removed. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override def nullSafeEval(v: Any): Any =
    UnicodeKernels.stripAccents(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.stripAccents($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
