package graft.functions

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The WHATWG Encoding Standard's label→encoding mapping ("get an
  * encoding"): labels are ASCII-whitespace-trimmed, ASCII-lowercased and
  * looked up in the spec's table — crucially, the legacy latin labels
  * (`iso-8859-1`, `latin1`, `ascii`, `us-ascii`, ...) all map to
  * windows-1252, because that is what the bytes of real web pages
  * labelled latin-1 actually are (curly quotes / em-dashes in 0x80–0x9F).
  * An unrecognized label is a lookup FAILURE — per the HTML standard the
  * declaration is then ignored and sniffing continues — not an error.
  *
  * JVM mapping notes (decoder fidelity, not label fidelity):
  *   - windows-1252 and x-user-defined are hand-rolled to the exact
  *     WHATWG index (the JDK cp1252 decoder rejects the five undefined
  *     bytes 0x81/0x8D/0x8F/0x90/0x9D that the spec maps to C1 controls);
  *   - shift_jis resolves to the JDK's windows-31j (the WHATWG index
  *     carries the NEC/IBM extensions) and euc-kr to x-windows-949 (the
  *     WHATWG euc-kr is UHC);
  *   - iso-8859-8-i shares iso-8859-8's decoder (the -i is directionality
  *     metadata), macintosh is x-MacRoman, windows-874 is x-windows-874;
  *   - iso-8859-10 / iso-8859-14 have no JVM decoder: recognized labels,
  *     but rows decode to NULL (declared poison, never mojibake);
  *   - the replacement encoding decodes any non-empty stream to NULL by
  *     contract (the spec emits a lone error/U+FFFD — a poisoned row). */
object WhatwgEncodings {

  private val table: Map[String, Seq[String]] = Map(
    "utf-8" -> Seq("unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8",
      "utf-8", "utf8", "x-unicode20utf8"),
    "ibm866" -> Seq("866", "cp866", "csibm866", "ibm866"),
    "iso-8859-2" -> Seq("csisolatin2", "iso-8859-2", "iso-ir-101",
      "iso8859-2", "iso88592", "iso_8859-2", "iso_8859-2:1987", "l2", "latin2"),
    "iso-8859-3" -> Seq("csisolatin3", "iso-8859-3", "iso-ir-109",
      "iso8859-3", "iso88593", "iso_8859-3", "iso_8859-3:1988", "l3", "latin3"),
    "iso-8859-4" -> Seq("csisolatin4", "iso-8859-4", "iso-ir-110",
      "iso8859-4", "iso88594", "iso_8859-4", "iso_8859-4:1988", "l4", "latin4"),
    "iso-8859-5" -> Seq("csisolatincyrillic", "cyrillic", "iso-8859-5",
      "iso-ir-144", "iso8859-5", "iso88595", "iso_8859-5", "iso_8859-5:1988"),
    "iso-8859-6" -> Seq("arabic", "asmo-708", "csiso88596e", "csiso88596i",
      "csisolatinarabic", "ecma-114", "iso-8859-6", "iso-8859-6-e",
      "iso-8859-6-i", "iso-ir-127", "iso8859-6", "iso88596", "iso_8859-6",
      "iso_8859-6:1987"),
    "iso-8859-7" -> Seq("csisolatingreek", "ecma-118", "elot_928", "greek",
      "greek8", "iso-8859-7", "iso-ir-126", "iso8859-7", "iso88597",
      "iso_8859-7", "iso_8859-7:1987", "sun_eu_greek"),
    "iso-8859-8" -> Seq("csiso88598e", "csisolatinhebrew", "hebrew",
      "iso-8859-8", "iso-8859-8-e", "iso-ir-138", "iso8859-8", "iso88598",
      "iso_8859-8", "iso_8859-8:1988", "visual"),
    "iso-8859-8-i" -> Seq("csiso88598i", "iso-8859-8-i", "logical"),
    "iso-8859-10" -> Seq("csisolatin6", "iso-8859-10", "iso-ir-157",
      "iso8859-10", "iso885910", "l6", "latin6"),
    "iso-8859-13" -> Seq("iso-8859-13", "iso8859-13", "iso885913"),
    "iso-8859-14" -> Seq("iso-8859-14", "iso8859-14", "iso885914"),
    "iso-8859-15" -> Seq("csisolatin9", "iso-8859-15", "iso8859-15",
      "iso885915", "iso_8859-15", "l9"),
    "iso-8859-16" -> Seq("iso-8859-16"),
    "koi8-r" -> Seq("cskoi8r", "koi", "koi8", "koi8-r", "koi8_r"),
    "koi8-u" -> Seq("koi8-ru", "koi8-u"),
    "macintosh" -> Seq("csmacintosh", "mac", "macintosh", "x-mac-roman"),
    "windows-874" -> Seq("dos-874", "iso-8859-11", "iso8859-11", "iso885911",
      "tis-620", "windows-874"),
    "windows-1250" -> Seq("cp1250", "windows-1250", "x-cp1250"),
    "windows-1251" -> Seq("cp1251", "windows-1251", "x-cp1251"),
    "windows-1252" -> Seq("ansi_x3.4-1968", "ascii", "cp1252", "cp819",
      "csisolatin1", "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1",
      "iso88591", "iso_8859-1", "iso_8859-1:1987", "l1", "latin1",
      "us-ascii", "windows-1252", "x-cp1252"),
    "windows-1253" -> Seq("cp1253", "windows-1253", "x-cp1253"),
    "windows-1254" -> Seq("cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148",
      "iso8859-9", "iso88599", "iso_8859-9", "iso_8859-9:1989", "l5",
      "latin5", "windows-1254", "x-cp1254"),
    "windows-1255" -> Seq("cp1255", "windows-1255", "x-cp1255"),
    "windows-1256" -> Seq("cp1256", "windows-1256", "x-cp1256"),
    "windows-1257" -> Seq("cp1257", "windows-1257", "x-cp1257"),
    "windows-1258" -> Seq("cp1258", "windows-1258", "x-cp1258"),
    "x-mac-cyrillic" -> Seq("x-mac-cyrillic", "x-mac-ukrainian"),
    "gbk" -> Seq("chinese", "csgb2312", "csiso58gb231280", "gb2312",
      "gb_2312", "gb_2312-80", "gbk", "iso-ir-58", "x-gbk"),
    "gb18030" -> Seq("gb18030"),
    "big5" -> Seq("big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5"),
    "euc-jp" -> Seq("cseucpkdfmtjapanese", "euc-jp", "x-euc-jp"),
    "iso-2022-jp" -> Seq("csiso2022jp", "iso-2022-jp"),
    "shift_jis" -> Seq("csshiftjis", "ms932", "ms_kanji", "shift-jis",
      "shift_jis", "sjis", "windows-31j", "x-sjis"),
    "euc-kr" -> Seq("cseuckr", "csksc56011987", "euc-kr", "iso-ir-149",
      "korean", "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601",
      "windows-949"),
    "replacement" -> Seq("csiso2022kr", "hz-gb-2312", "iso-2022-cn",
      "iso-2022-cn-ext", "iso-2022-kr", "replacement"),
    "utf-16be" -> Seq("unicodefffe", "utf-16be"),
    "utf-16le" -> Seq("csunicode", "iso-10646-ucs-2", "ucs-2", "unicode",
      "unicodefeff", "utf-16", "utf-16le"),
    "x-user-defined" -> Seq("x-user-defined"))

  private val labelToEncoding: Map[String, String] =
    table.flatMap { case (enc, labels) => labels.map(_ -> enc) }

  /** WHATWG "get an encoding": trim ASCII whitespace, ASCII-lowercase,
    * look up. None = unrecognized label (the declaration is skipped). */
  def forLabel(label: String): Option[String] = {
    if (label == null) return None
    var a = 0
    var b = label.length
    def isWs(ch: Char) =
      ch == ' ' || ch == '\t' || ch == '\n' || ch == '\f' || ch == '\r'
    while (a < b && isWs(label.charAt(a))) a += 1
    while (b > a && isWs(label.charAt(b - 1))) b -= 1
    val sb = new java.lang.StringBuilder(b - a)
    var i = a
    while (i < b) {
      val ch = label.charAt(i)
      sb.append(if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch)
      i += 1
    }
    labelToEncoding.get(sb.toString)
  }

  /** The JVM charset serving a WHATWG encoding name (for the arms not
    * hand-rolled and not structurally unsupported). */
  def jdkName(enc: String): String = enc match {
    case "iso-8859-8-i" => "ISO-8859-8"
    case "macintosh" => "x-MacRoman"
    case "windows-874" => "x-windows-874"
    case "x-mac-cyrillic" => "x-MacCyrillic"
    case "shift_jis" => "windows-31j"
    case "euc-kr" => "x-windows-949"
    case e => e
  }

  /** WHATWG windows-1252 index, 0x80–0x9F (the rest is identity latin-1).
    * Total: every byte decodes — including the five positions the JDK
    * cp1252 decoder rejects (0x81/0x8D/0x8F/0x90/0x9D → C1 controls). */
  val w1252Hi: Array[Char] = Array(
    '\u20AC', '\u0081', '\u201A', '\u0192', '\u201E', '\u2026', '\u2020',
    '\u2021', '\u02C6', '\u2030', '\u0160', '\u2039', '\u0152', '\u008D',
    '\u017D', '\u008F', '\u0090', '\u2018', '\u2019', '\u201C', '\u201D',
    '\u2022', '\u2013', '\u2014', '\u02DC', '\u2122', '\u0161', '\u203A',
    '\u0153', '\u009D', '\u017E', '\u0178')

  private val w1252Inv: Map[Char, Int] =
    w1252Hi.zipWithIndex.map { case (c, i) => c -> (0x80 + i) }.toMap

  def decodeW1252(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      out(i) = if (b >= 0x80 && b <= 0x9F) w1252Hi(b - 0x80) else b.toChar
      i += 1
    }
    new String(out)
  }

  /** Inverse of [[decodeW1252]]; null when a char has no cp1252 byte. */
  def encodeW1252(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80 || (c >= 0xA0 && c <= 0xFF)) out(i) = c.toByte
      else w1252Inv.get(c) match {
        case Some(b) => out(i) = b.toByte
        case None => return null
      }
      i += 1
    }
    out
  }

  /** x-user-defined: ASCII passthrough below 0x80, U+F780+(b−0x80) above
    * (the private-use ramp the spec reserves for byte-transparent text). */
  def decodeXUserDefined(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      out(i) = if (b < 0x80) b.toChar else (0xF700 + b).toChar
      i += 1
    }
    new String(out)
  }

  def encodeXUserDefined(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      if (c < 0x80) out(i) = c.toByte
      else if (c >= 0xF780 && c <= 0xF7FF) out(i) = (c - 0xF700).toByte
      else return null
      i += 1
    }
    out
  }
}

/** Charset-aware bytes→text decode for crawled payloads — the step between
  * the WARC container (x91/x92) and the HTML extraction lane (x87). Real
  * crawl payloads arrive as BYTES in a declared-or-sniffed encoding; the
  * reference's test pipeline only ever casts Binary→Utf8
  * (tests/basic_tests.rs:53-56), which silently mangles anything that is
  * not already UTF-8. This codec implements the WHATWG-ordered sniff:
  *
  *   1. BOM — authoritative, OVERRIDES any declared charset (WHATWG
  *      "Encoding" §decode: a UTF-8/UTF-16 BOM wins over everything);
  *   2. transport declaration — the `charset=` parameter of the
  *      Content-Type header value (quoted or bare, case-insensitive),
  *      resolved through the WHATWG label table ([[WhatwgEncodings]]) —
  *      so `iso-8859-1`/`latin1`/`ascii` decode as windows-1252, the
  *      bytes real pages labelled that way actually carry. A label the
  *      table does not know is SKIPPED (WHATWG "get an encoding"
  *      failure ⇒ ignore the declaration) and sniffing continues;
  *   3. in-band declaration — the WHATWG meta prescan over the first
  *      1024 bytes, covering both `<meta charset=...>` and
  *      `<meta http-equiv=Content-Type content="...; charset=...">`,
  *      with the HTML-standard prescan adjustments (a meta-declared
  *      utf-16 is treated as utf-8, x-user-defined as windows-1252);
  *   4. fallback UTF-8.
  *
  * Decoding is STRICT (CodingErrorAction.REPORT): a payload whose bytes do
  * not conform to the chosen encoding returns NULL — the ingestion lane's
  * "poisoned row" flag, matching warc_extract's malformed=>NULL contract.
  * Replacement characters would silently corrupt training text; NULL keeps
  * the loss auditable. Rows selecting the replacement encoding, or an
  * encoding with no JVM decoder (iso-8859-10/-14), are NULL for the same
  * reason. The prescan is byte-oriented (ISO-8859-1 view), so an
  * undeclared BOM-less UTF-16 page cannot satisfy it and falls through to
  * the strict-UTF-8 arm — by design, those rows surface as NULL. */
object CharsetCodec {

  // whitespace inside a quoted value is allowed — WHATWG "get an
  // encoding" trims ASCII whitespace from the label before lookup
  private val ctCharset = java.util.regex.Pattern.compile(
    "(?i)charset\\s*=\\s*\"?\\s*([A-Za-z0-9._:+-]+)\\s*\"?")
  private val metaTag = java.util.regex.Pattern.compile(
    "(?i)<meta[\\s/][^>]*>")
  private val attrPat = java.util.regex.Pattern.compile(
    "(?i)([a-z-]+)\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s\"'>]+))")

  /** The WHATWG meta prescan over the byte-oriented head view: walk each
    * `<meta ...>` tag and read charset ONLY from the places the spec
    * reads it — a `charset` ATTRIBUTE, or the `charset=` parameter of a
    * `content` attribute when `http-equiv` is Content-Type. A bare
    * `charset=` substring inside some other attribute value (e.g. a
    * description mentioning charsets) must NOT hijack the decode.
    * Pragmatic simplification vs the full spec: tags are delimited by the
    * next '>', so a literal '>' inside a quoted meta attribute value
    * truncates that tag's attribute scan (it cannot select a charset the
    * page did not declare — at worst the declaration is missed and the
    * row falls through to strict UTF-8). */
  private def metaPrescan(head: String): String = {
    val m = metaTag.matcher(head)
    while (m.find()) {
      val tag = m.group()
      var charset: String = null
      var httpEquiv: String = null
      var content: String = null
      val am = attrPat.matcher(tag)
      while (am.find()) {
        val v =
          if (am.group(3) != null) am.group(3)
          else if (am.group(4) != null) am.group(4)
          else am.group(5)
        am.group(1).toLowerCase(java.util.Locale.ROOT) match {
          case "charset" => if (charset == null) charset = v
          case "http-equiv" => if (httpEquiv == null) httpEquiv = v
          case "content" => if (content == null) content = v
          case _ =>
        }
      }
      if (charset != null && charset.nonEmpty) return charset.trim
      if (httpEquiv != null && httpEquiv.equalsIgnoreCase("content-type") &&
          content != null) {
        val cm = ctCharset.matcher(content)
        if (cm.find()) return cm.group(1)
      }
    }
    null
  }

  /** Decode under a WHATWG encoding NAME (post-label-resolution). */
  private def decodeNamed(bytes: Array[Byte], enc: String): String = enc match {
    case "windows-1252" => WhatwgEncodings.decodeW1252(bytes)
    case "x-user-defined" => WhatwgEncodings.decodeXUserDefined(bytes)
    case "replacement" =>
      if (bytes.length == 0) "" else null // spec: one error for the stream
    case "iso-8859-10" | "iso-8859-14" => null // no JVM decoder: poison
    case other =>
      try strict(bytes, 0, Charset.forName(WhatwgEncodings.jdkName(other)))
      catch { case _: Exception => null }
  }

  /** `contentType` empty/absent means "no transport declaration". */
  def decode(bytes: Array[Byte], contentType: String): String = {
    if (bytes == null) return null
    // 1. BOM
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
        (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF)
      return strict(bytes, 3, StandardCharsets.UTF_8)
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF)
      return strict(bytes, 2, StandardCharsets.UTF_16BE)
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xFE)
      return strict(bytes, 2, StandardCharsets.UTF_16LE)
    // 2. Content-Type charset parameter — WHATWG label resolution; an
    // unrecognized label is skipped, not poisoned (sniffing continues)
    if (contentType != null && !contentType.isEmpty) {
      val m = ctCharset.matcher(contentType)
      if (m.find()) {
        WhatwgEncodings.forLabel(m.group(1)) match {
          case Some(enc) => return decodeNamed(bytes, enc)
          case None => // fall through to the meta prescan
        }
      }
    }
    // 3. meta prescan (first 1024 bytes, byte-oriented, attribute-aware)
    val head = new String(bytes, 0, math.min(bytes.length, 1024),
      StandardCharsets.ISO_8859_1)
    val metaCs = metaPrescan(head)
    if (metaCs != null) {
      WhatwgEncodings.forLabel(metaCs) match {
        case Some(enc0) =>
          // HTML §prescan: an in-band utf-16 declaration means the page
          // was authored assuming ASCII-compatible bytes → utf-8; an
          // in-band x-user-defined means windows-1252
          val enc = enc0 match {
            case "utf-16le" | "utf-16be" => "utf-8"
            case "x-user-defined" => "windows-1252"
            case e => e
          }
          return decodeNamed(bytes, enc)
        case None => // unrecognized in-band label: keep sniffing
      }
    }
    // 4. fallback
    strict(bytes, 0, StandardCharsets.UTF_8)
  }

  private def strict(bytes: Array[Byte], off: Int, cs: Charset): String =
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(bytes, off, bytes.length - off))
        .toString
    } catch { case _: java.nio.charset.CharacterCodingException => null }

  /** Encode under a WHATWG LABEL — the test-data constructor's inverse of
    * [[decode]] (real pipelines only decode; the x92 shard builder needs
    * the legacy bytes to exist in the first place). Strict: null when a
    * char has no byte in the target encoding or the label is
    * unrecognized/encoder-less. */
  def encode(s: String, label: String): Array[Byte] = {
    if (s == null) return null
    WhatwgEncodings.forLabel(label) match {
      case Some("windows-1252") => WhatwgEncodings.encodeW1252(s)
      case Some("x-user-defined") => WhatwgEncodings.encodeXUserDefined(s)
      case Some("replacement") | Some("iso-8859-10") | Some("iso-8859-14") =>
        null
      case Some(enc) =>
        try {
          val e = Charset.forName(WhatwgEncodings.jdkName(enc)).newEncoder()
            .onMalformedInput(CodingErrorAction.REPORT)
            .onUnmappableCharacter(CodingErrorAction.REPORT)
          val bb = e.encode(java.nio.CharBuffer.wrap(s))
          val out = new Array[Byte](bb.remaining())
          bb.get(out)
          out
        } catch { case _: Exception => null }
      case None => null
    }
  }

  def decodeU8(bytes: Array[Byte], contentType: UTF8String): UTF8String = {
    val s = decode(bytes, if (contentType == null) "" else contentType.toString)
    if (s == null) null else UTF8String.fromString(s)
  }

  def encodeU8(s: UTF8String, label: String): Array[Byte] =
    if (s == null) null else encode(s.toString, label)
}

/** `decode_charset(bytes, content_type)` — see [[CharsetCodec.decode]].
  * An empty content_type means no transport declaration (callers coalesce
  * NULL to "" so a header-less record still BOM/meta-sniffs). */
case class DecodeCharset(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "decode_charset"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(BinaryType, StringType)

  override def nullSafeEval(bytes: Any, ctype: Any): Any =
    CharsetCodec.decodeU8(bytes.asInstanceOf[Array[Byte]],
      ctype.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) => s"""
      ${ev.value} = graft.functions.CharsetCodec.decodeU8($b, $c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** `encode_whatwg(str)` for a fixed WHATWG charset label — the shard
  * builder's encoder (see [[CharsetCodec.encode]]); null on a char the
  * target encoding cannot represent. */
case class EncodeWhatwg(child: Expression, label: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "encode_whatwg"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(StringType)

  override def nullSafeEval(s: Any): Any =
    CharsetCodec.encodeU8(s.asInstanceOf[UTF8String], label)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("label", label, "java.lang.String")
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.functions.CharsetCodec.encodeU8($s, $l);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
