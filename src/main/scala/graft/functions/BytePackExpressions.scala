package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** `pack_bytes(array<int>)` — pack an int array into a binary, one byte per
  * element (low 8 bits, i.e. `(byte) v`). Optimization primitive (round 17):
  * the synthetic frame/payload generators used to build per-byte HEX STRINGS
  * (`lpad(hex(v), 2, '0')` per element + `array_join` + `unhex` per frame —
  * five transient strings per byte, interpreted HOF lambdas throughout);
  * this expression writes the bytes directly. For values 0..255 it is
  * byte-identical to `unhex(array_join(transform(a, v -> lpad(hex(v), 2,
  * '0')), ''))` (BytePackSpec pins that equivalence and the eval==codegen
  * parity). A null element yields NULL, matching the wav_pcm16 contract. */
case class PackBytes(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pack_bytes"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(ArrayType(IntegerType))

  override def nullSafeEval(arr: Any): Any =
    PackBytes.pack(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.PackBytes.pack($a);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PackBytes {
  /** Null element → null result (engine-independent; see WavCodec note on
    * GenericArrayData vs UnsafeArrayData null handling). */
  def pack(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      out(i) = arr.getInt(i).toByte
      i += 1
    }
    out
  }
}
