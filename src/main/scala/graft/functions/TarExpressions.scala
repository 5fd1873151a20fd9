package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `tar_pack(entries)` — encode an array of (name, data) structs as a REAL
  * POSIX ustar archive (the public tar format: 512-byte headers with octal
  * size/mtime fields, the space-seeded header checksum, `ustar` magic,
  * data padded to 512-byte blocks, two zero blocks at EOF) — the layout
  * `tar(1)` and every WebDataset loader reads. Training pipelines ship
  * multimodal samples as exactly these shards (WebDataset: one tar per
  * shard, one file per sample part), so the encode lane exists to prove
  * the INDEX lane ([[TarIndex]]) against genuinely-encoded bytes. Entries
  * must have non-null names ≤ 100 bytes (the ustar name field) and
  * non-null data; anything else → NULL, mirroring the poisoned-payload
  * contract of the other codec lanes. Deterministic: mode/uid/gid/mtime
  * are fixed, so identical inputs give identical bytes. */
case class TarPack(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "tar_pack"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("data", BinaryType)))))

  override def nullSafeEval(v: Any): Any =
    TarCodec.packChecked(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TarCodec.packChecked($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `tar_index(bytes)` — walk a ustar archive's 512-byte header chain and
  * return one row per entry WITHOUT touching unneeded payload bytes beyond
  * the per-entry stats: (name, size, chksum_ok, data_sum, data_max). The
  * header checksum is re-computed exactly as `tar(1)` does (sum of the
  * header with the checksum field read as spaces) and compared to the
  * stored octal value — a flipped header byte flips `chksum_ok`. Returns
  * NULL for payloads that are not a well-formed ustar chain (bad magic,
  * non-octal size, truncated data, missing EOF blocks, name > 100 bytes),
  * never a crash. The index walk is the WebDataset access pattern at
  * 100 TB: shard listings and sample routing read only headers, skipping
  * payload blocks by their declared (and checksum-protected) sizes. */
case class TarIndex(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType =
    ArrayType(TarCodec.entryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "tar_index"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(BinaryType)

  override def nullSafeEval(v: Any): Any =
    TarCodec.index(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TarCodec.index($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TarCodec {
  val entryType: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("chksum_ok", BooleanType, nullable = false),
    StructField("data_sum", LongType, nullable = false),
    StructField("data_max", IntegerType, nullable = false)))

  private val BLOCK = 512

  def packChecked(entries: ArrayData): Array[Byte] = {
    val n = entries.numElements()
    val names = new Array[Array[Byte]](n)
    val datas = new Array[Array[Byte]](n)
    var total = 1024L // EOF blocks
    var i = 0
    while (i < n) {
      if (entries.isNullAt(i)) return null
      val row = entries.getStruct(i, 2)
      if (row.isNullAt(0) || row.isNullAt(1)) return null
      names(i) = row.getUTF8String(0).getBytes
      datas(i) = row.getBinary(1)
      if (names(i).length == 0 || names(i).length > 100) return null
      total += BLOCK + ((datas(i).length + BLOCK - 1L) / BLOCK) * BLOCK
      i += 1
    }
    if (total > Int.MaxValue) return null
    val out = new Array[Byte](total.toInt)
    var pos = 0
    i = 0
    while (i < n) {
      writeHeader(out, pos, names(i), datas(i).length)
      pos += BLOCK
      System.arraycopy(datas(i), 0, out, pos, datas(i).length)
      pos += ((datas(i).length + BLOCK - 1) / BLOCK) * BLOCK
      i += 1
    }
    out // the two EOF blocks stay zero
  }

  private def writeOctal(out: Array[Byte], pos: Int, width: Int,
      value: Long): Unit = {
    // POSIX numeric field: zero-padded octal, NUL terminator
    var v = value
    var i = pos + width - 2
    out(pos + width - 1) = 0
    while (i >= pos) {
      out(i) = ('0' + (v & 7)).toByte
      v >>= 3
      i -= 1
    }
  }

  private def writeHeader(out: Array[Byte], pos: Int, name: Array[Byte],
      size: Int): Unit = {
    System.arraycopy(name, 0, out, pos, name.length)           // name[100]
    writeOctal(out, pos + 100, 8, 420)                         // mode 0644
    writeOctal(out, pos + 108, 8, 0)                           // uid
    writeOctal(out, pos + 116, 8, 0)                           // gid
    writeOctal(out, pos + 124, 12, size)                       // size
    writeOctal(out, pos + 136, 12, 0)                          // mtime
    java.util.Arrays.fill(out, pos + 148, pos + 156, ' '.toByte) // chksum seed
    out(pos + 156) = '0'                                       // typeflag: file
    // magic "ustar\0" + version "00"
    val magic = Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0')
    System.arraycopy(magic, 0, out, pos + 257, 8)
    var sum = 0
    var i = pos
    while (i < pos + BLOCK) { sum += out(i) & 0xFF; i += 1 }
    // checksum: 6 octal digits, NUL, space (the convention tar(1) writes)
    writeOctal(out, pos + 148, 7, sum)
    out(pos + 155) = ' '
  }

  private def parseOctal(bytes: Array[Byte], pos: Int, width: Int): Long = {
    var v = 0L
    var i = pos
    val end = pos + width
    var seen = false
    while (i < end) {
      val b = bytes(i)
      if (b >= '0' && b <= '7') { v = (v << 3) | (b - '0'); seen = true }
      else if (b == 0 || b == ' ') { if (seen) return v }
      else return -1L
      if (v < 0) return -1L // overflow
      i += 1
    }
    if (seen) v else -1L
  }

  def index(bytes: Array[Byte]): GenericArrayData = {
    if (bytes == null || bytes.length < 1024 ||
        bytes.length % BLOCK != 0) return null
    val rows = scala.collection.mutable.ArrayBuffer[InternalRow]()
    var pos = 0
    while (pos + BLOCK <= bytes.length) {
      // EOF: a zero block ends the chain (a second must follow)
      var allZero = true
      var i = pos
      while (allZero && i < pos + BLOCK) { allZero = bytes(i) == 0; i += 1 }
      if (allZero) {
        if (pos + 2 * BLOCK > bytes.length) return null
        i = pos + BLOCK
        while (i < pos + 2 * BLOCK) { if (bytes(i) != 0) return null; i += 1 }
        return new GenericArrayData(rows.toArray[Any])
      }
      // magic check ("ustar" at 257; NUL- or space-terminated variants)
      if (bytes(pos + 257) != 'u' || bytes(pos + 258) != 's' ||
          bytes(pos + 259) != 't' || bytes(pos + 260) != 'a' ||
          bytes(pos + 261) != 'r') return null
      var nameLen = 0
      while (nameLen < 100 && bytes(pos + nameLen) != 0) nameLen += 1
      if (nameLen == 0) return null
      val size = parseOctal(bytes, pos + 124, 12)
      if (size < 0 || pos.toLong + BLOCK + size > bytes.length) return null
      val stored = parseOctal(bytes, pos + 148, 8)
      var sum = 0
      i = pos
      while (i < pos + BLOCK) {
        sum += (if (i >= pos + 148 && i < pos + 156) ' '.toInt
                else bytes(i) & 0xFF)
        i += 1
      }
      var dataSum = 0L; var dataMax = 0
      i = pos + BLOCK
      val dEnd = pos + BLOCK + size.toInt
      while (i < dEnd) {
        val b = bytes(i) & 0xFF
        dataSum += b
        if (b > dataMax) dataMax = b
        i += 1
      }
      rows += InternalRow(
        UTF8String.fromBytes(bytes, pos, nameLen), size,
        stored == sum, dataSum, dataMax)
      pos += BLOCK + (((size + BLOCK - 1) / BLOCK) * BLOCK).toInt
    }
    null // ran off the end without the EOF blocks
  }
}
