package graft.functions

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  *      Content-Type header value (quoted or bare, case-insensitive);
  *   3. in-band declaration — the WHATWG meta prescan over the first
  *      1024 bytes, covering both `<meta charset=...>` and
  *      `<meta http-equiv=Content-Type content="...; charset=...">`;
  *   4. fallback UTF-8.
  *
  * Decoding is STRICT (CodingErrorAction.REPORT): a payload whose bytes do
  * not conform to the chosen encoding, or whose declared charset is
  * unknown/unsupported, returns NULL — the ingestion lane's "poisoned row"
  * flag, matching warc_extract's malformed=>NULL contract. Replacement
  * characters would silently corrupt training text; NULL keeps the loss
  * auditable. The prescan is byte-oriented (ISO-8859-1 view), so an
  * undeclared BOM-less UTF-16 page cannot satisfy it and falls through to
  * the strict-UTF-8 arm — by design, those rows surface as NULL. */
object CharsetCodec {

  private val ctCharset = java.util.regex.Pattern.compile(
    "(?i)charset\\s*=\\s*\"?([A-Za-z0-9._:+-]+)\"?")
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
    // 2. Content-Type charset parameter
    if (contentType != null && !contentType.isEmpty) {
      val m = ctCharset.matcher(contentType)
      if (m.find()) return strictNamed(bytes, m.group(1))
    }
    // 3. meta prescan (first 1024 bytes, byte-oriented, attribute-aware)
    val head = new String(bytes, 0, math.min(bytes.length, 1024),
      StandardCharsets.ISO_8859_1)
    val metaCs = metaPrescan(head)
    if (metaCs != null) return strictNamed(bytes, metaCs)
    // 4. fallback
    strict(bytes, 0, StandardCharsets.UTF_8)
  }

  private def strictNamed(bytes: Array[Byte], name: String): String =
    try strict(bytes, 0, Charset.forName(name))
    catch { case _: Exception => null } // unknown/illegal charset name

  private def strict(bytes: Array[Byte], off: Int, cs: Charset): String =
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(bytes, off, bytes.length - off))
        .toString
    } catch { case _: java.nio.charset.CharacterCodingException => null }

  def decodeU8(bytes: Array[Byte], contentType: UTF8String): UTF8String = {
    val s = decode(bytes, if (contentType == null) "" else contentType.toString)
    if (s == null) null else UTF8String.fromString(s)
  }
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
