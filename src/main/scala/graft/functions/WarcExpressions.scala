package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real WARC (ISO 28500 / WARC/1.0) record encode + parse — the container
  * a 100 TB crawled corpus actually arrives in (Common Crawl ships WARC;
  * the x87/x88/x90 lanes start from its response payloads). Same no-stub
  * standard as the WAV/AVI/ustar containers: `warc_record` writes genuine
  * records (version line, named headers, Content-Length, the spec's
  * CRLF CRLF record terminator), `warc_extract` walks them back by
  * header-declared lengths — encode→parse must be the identity on every
  * payload byte, which the oracle checks from the raw construction
  * without ever parsing WARC. */
object WarcCodec {

  private val dateFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  /** One WARC/1.0 record: headers + payload + CRLFCRLF terminator.
    * WARC-Date renders the ms timestamp second-truncated in UTC (fixed
    * width — deterministic bytes). */
  def record(wtype: String, uri: String, tsMs: Long,
      payload: Array[Byte]): Array[Byte] = {
    if (wtype == null || uri == null || payload == null) return null
    val mt = if (wtype == "response") "response" else "request"
    val header =
      s"WARC/1.0\r\n" +
      s"WARC-Type: $wtype\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: ${dateFmt.format(java.time.Instant.ofEpochMilli(tsMs))}\r\n" +
      s"WARC-Record-ID: <urn:graft:$wtype:$tsMs>\r\n" +
      s"Content-Type: application/http;msgtype=$mt\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    val hb = header.getBytes("UTF-8")
    val out = new Array[Byte](hb.length + payload.length + 4)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(payload, 0, out, hb.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  val recordType: StructType = StructType(Seq(
    StructField("wtype", StringType, nullable = false),
    StructField("uri", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Parse a concatenation of WARC records: version line, header block to
    * the first CRLFCRLF, Content-Length payload bytes, CRLFCRLF record
    * terminator, repeat. Header names case-insensitive per the spec.
    * Returns NULL for anything malformed (bad magic, missing
    * Content-Length, truncated payload or terminator) — the ingestion
    * lane's "undecodable shard" flag, never a crash. */
  def extract(bytes: Array[Byte]): GenericArrayData = {
    if (bytes == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    def indexOfCrlfCrlf(from: Int): Int = {
      var k = from
      while (k + 3 < bytes.length) {
        if (bytes(k) == '\r' && bytes(k + 1) == '\n' &&
            bytes(k + 2) == '\r' && bytes(k + 3) == '\n') return k
        k += 1
      }
      -1
    }
    while (i < bytes.length) {
      val hEnd = indexOfCrlfCrlf(i)
      if (hEnd < 0) return null
      val header = new String(bytes, i, hEnd - i, "UTF-8")
      val lines = header.split("\r\n", -1)
      if (lines.isEmpty || !lines(0).startsWith("WARC/")) return null
      var wtype: String = null
      var uri: String = null
      var clen = -1
      lines.iterator.drop(1).foreach { l =>
        val c = l.indexOf(':')
        if (c > 0) {
          val k = l.substring(0, c).trim.toLowerCase(Locale.ROOT)
          val v = l.substring(c + 1).trim
          k match {
            case "warc-type" => wtype = v
            case "warc-target-uri" => uri = v
            case "content-length" =>
              try clen = Integer.parseInt(v)
              catch { case _: NumberFormatException => return null }
            case _ =>
          }
        }
      }
      if (wtype == null || uri == null || clen < 0) return null
      val pStart = hEnd + 4
      // Long arithmetic: a hostile Content-Length near Int.MaxValue would
      // wrap `pStart + clen + 4` negative and sail past an int comparison,
      // turning the "malformed shard => NULL" contract into a crash.
      if (pStart.toLong + clen.toLong + 4L > bytes.length.toLong) return null
      val payload = java.util.Arrays.copyOfRange(bytes, pStart, pStart + clen)
      if (bytes(pStart + clen) != '\r' || bytes(pStart + clen + 1) != '\n' ||
          bytes(pStart + clen + 2) != '\r' || bytes(pStart + clen + 3) != '\n')
        return null
      out += InternalRow(UTF8String.fromString(wtype),
        UTF8String.fromString(uri), clen, payload)
      i = pStart + clen + 4
    }
    new GenericArrayData(out.toArray)
  }

  def recordU8(wtype: String, uri: UTF8String, tsMs: Long,
      payload: Array[Byte]): Array[Byte] =
    if (uri == null) null else record(wtype, uri.toString, tsMs, payload)
}

/** Per-record gzip member framing — the shape crawled corpora actually
  * ship in (`*.warc.gz`): each WARC record is compressed as its OWN gzip
  * member and the members are concatenated, so a reader can split a shard
  * at member boundaries without inflating the whole file (ISO 28500 annex;
  * Common Crawl's distribution format). `warc_gz_record` emits one member
  * per record; `warc_gz_extract` inflates a concatenation of members
  * member-by-member (explicit RFC 1952 header parse + raw Inflater + CRC32
  * and ISIZE trailer verification, so EVERY input byte is accounted for)
  * and hands the raw stream to [[WarcCodec.extract]]. Malformation
  * anywhere — bad gzip magic, a corrupt member, a CRC mismatch, an
  * inflation bomb past the cap, or ANY leftover bytes that do not form a
  * valid member (a shard corrupted or truncated exactly at a member
  * boundary) — degrades to NULL, never a crash and never a silently
  * shortened record list. (The JDK's GZIPInputStream treats an invalid
  * header on a subsequent member as clean EOF, which would drop records
  * without a trace — the one leniency this codec refuses.) */
object WarcGzCodec {

  /** Inflated-size cap per shard: hostile crawl data can carry gzip bombs,
    * and "malformed shard => NULL" must hold for them too instead of
    * OOM-ing an executor. 256 MiB is ~250× a normal WARC shard payload. */
  val MaxInflatedBytes: Long = 256L << 20

  /** One gzip member wrapping `bytes`. The JDK writes a fixed header
    * (MTIME=0, XFL=0) so the member bytes are deterministic per input. */
  def gzMember(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null) return null
    val bo = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(bytes); gz.finish(); gz.close()
    bo.toByteArray
  }

  /** RFC 1952 member header: returns the offset of the first deflate byte,
    * or -1 when the bytes at `off` are not a well-formed gzip header. */
  private def parseGzHeader(bytes: Array[Byte], off: Int): Int = {
    if (off + 10 > bytes.length) return -1
    if ((bytes(off) & 0xFF) != 0x1F || (bytes(off + 1) & 0xFF) != 0x8B ||
        bytes(off + 2) != 8) return -1
    val flg = bytes(off + 3) & 0xFF
    if ((flg & 0xE0) != 0) return -1 // reserved FLG bits must be zero
    var p = off + 10 // past MTIME(4) + XFL + OS
    if ((flg & 4) != 0) { // FEXTRA
      if (p + 2 > bytes.length) return -1
      val xlen = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8)
      p += 2 + xlen
      if (p > bytes.length) return -1
    }
    if ((flg & 8) != 0) { // FNAME: NUL-terminated
      while (p < bytes.length && bytes(p) != 0) p += 1
      if (p >= bytes.length) return -1
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT
      while (p < bytes.length && bytes(p) != 0) p += 1
      if (p >= bytes.length) return -1
      p += 1
    }
    if ((flg & 2) != 0) { // FHCRC
      p += 2
      if (p > bytes.length) return -1
    }
    p
  }

  private def le32(bytes: Array[Byte], off: Int): Long =
    (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
      ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)

  /** Inflate a concatenation of gzip members back to the raw byte stream;
    * NULL on any malformed member, past [[MaxInflatedBytes]], or when EOF
    * is reached with unconsumed bytes that do not form a complete member —
    * so corruption AT a member boundary surfaces as the contracted NULL
    * instead of a silently shortened stream. */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null) return null
    if (bytes.length == 0) return Array.emptyByteArray
    try {
      // initial-capacity HINT in long arithmetic, capped: `length * 2 + 64`
      // in int would wrap negative past ~1 GiB input and throw
      // IllegalArgumentException — a crash, not the contracted NULL
      val bo = new java.io.ByteArrayOutputStream(
        math.min(bytes.length.toLong * 2 + 64, 1L << 24).toInt)
      val buf = new Array[Byte](1 << 16)
      var off = 0
      var total = 0L
      while (off < bytes.length) {
        off = parseGzHeader(bytes, off)
        if (off < 0) return null
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(bytes, off, bytes.length - off)
          val crc = new java.util.zip.CRC32
          var memberOut = 0L
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n == 0 && inf.needsInput()) return null // truncated deflate
            if (n > 0) {
              crc.update(buf, 0, n)
              memberOut += n
              total += n
              if (total > MaxInflatedBytes) return null
              bo.write(buf, 0, n)
            }
          }
          off = bytes.length - inf.getRemaining
          // trailer: CRC32 + ISIZE (mod 2^32), both little-endian
          if (off + 8 > bytes.length) return null
          if (le32(bytes, off) != crc.getValue) return null
          if (le32(bytes, off + 4) != (memberOut & 0xFFFFFFFFL)) return null
          off += 8
        } finally inf.end()
      }
      bo.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => null
      case _: java.io.IOException => null
    }
  }

  def warcGzRecord(wtype: String, uri: UTF8String, tsMs: Long,
      payload: Array[Byte]): Array[Byte] = {
    val rec = WarcCodec.recordU8(wtype, uri, tsMs, payload)
    if (rec == null) null else gzMember(rec)
  }

  def warcGzExtract(bytes: Array[Byte]): GenericArrayData = {
    val raw = gunzipAll(bytes)
    if (raw == null) null else WarcCodec.extract(raw)
  }
}

/** `warc_gz_record(uri, ts_ms, payload)` — one WARC record as one gzip
  * member (the *.warc.gz framing), for a fixed WARC-Type. */
case class WarcGzRecord(first: Expression, second: Expression,
    third: Expression, wtype: String)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "warc_gz_record"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(StringType, LongType, BinaryType)

  override def nullSafeEval(uri: Any, ts: Any, payload: Any): Any =
    WarcGzCodec.warcGzRecord(wtype, uri.asInstanceOf[UTF8String],
      ts.asInstanceOf[Long], payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("wtype", wtype, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (u, t, p) => s"""
      ${ev.value} = graft.functions.WarcGzCodec.warcGzRecord($w, $u, $t, $p);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** `warc_gz_extract(bytes)` — inflate concatenated gzip members and parse
  * the WARC records inside; NULL for malformed shards. */
case class WarcGzExtract(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType =
    ArrayType(WarcCodec.recordType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "warc_gz_extract"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(BinaryType)

  override def nullSafeEval(v: Any): Any =
    WarcGzCodec.warcGzExtract(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WarcGzCodec.warcGzExtract($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `warc_record(uri, ts_ms, payload)` for a fixed WARC-Type. */
case class WarcRecord(first: Expression, second: Expression,
    third: Expression, wtype: String)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "warc_record"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(StringType, LongType, BinaryType)

  override def nullSafeEval(uri: Any, ts: Any, payload: Any): Any =
    WarcCodec.recordU8(wtype, uri.asInstanceOf[UTF8String],
      ts.asInstanceOf[Long], payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("wtype", wtype, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (u, t, p) => s"""
      ${ev.value} = graft.functions.WarcCodec.recordU8($w, $u, $t, $p);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** `warc_extract(bytes)` → array of (wtype, uri, n_bytes, payload). */
case class WarcExtract(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType =
    ArrayType(WarcCodec.recordType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "warc_extract"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(BinaryType)

  override def nullSafeEval(v: Any): Any =
    WarcCodec.extract(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WarcCodec.extract($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
