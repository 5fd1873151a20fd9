package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `html_text(html)` — extract the visible text of an HTML document: the
  * tag-strip / boilerplate-ahead step every crawled-corpus pipeline runs
  * before chunking and dedup (the CCNet/trafilatura position in the stack;
  * VERDICT r14 next-round #2). Implemented from the public HTML syntax
  * (WHATWG HTML: raw-text elements, comments, character references) as a
  * single forward character walk — no DOM, no allocation beyond the two
  * builders — so the expression runs at scan speed inside whole-stage
  * codegen on a 100 TB corpus.
  *
  * Extraction semantics (deterministic, engine-independent, and exactly
  * what the DuckDB oracle replays on synthesized pages):
  *
  *   - `<script>` and `<style>` subtrees are EXCISED with the spec's
  *     raw-text rule: content ends only at the matching case-insensitive
  *     `</script` / `</style` — an embedded `"</div>"` string stays dead.
  *     Unterminated raw text swallows the rest of the document.
  *   - `<!-- comments -->` (tags inside and all), `<!DOCTYPE>` /
  *     `<! ... >` declarations and `<? ... >` PIs are dropped.
  *   - Tag scanning honors quoted attribute values, so a literal `>`
  *     inside `title="x > y"` does not end the tag.
  *   - BLOCK elements (html/head/body/title/p/div/br/hr/li/ul/ol/table/
  *     tr/td/th/h1..h6/nav/header/footer/aside/section/article/main/
  *     blockquote/pre/form/select/option/figure/figcaption/meta/link,
  *     open or close) are line boundaries; every other tag (a/b/i/em/
  *     strong/span/...) is inline and contributes NOTHING — `Do<b>c</b>`
  *     extracts as `Doc`.
  *   - Character references decode: the core named set (`&amp; &lt; &gt;
  *     &quot; &apos;`), `&nbsp;` (to a plain space), and numeric
  *     `&#NNN;` / `&#xHH;` including supplementary planes. An `&` that
  *     does not introduce a well-formed reference stays literal.
  *   - Whitespace (space, \t, \r, \n, \f, and U+00A0 — corpus cleaning
  *     wants nbsp collapsible) collapses to single spaces; lines are
  *     trimmed; empty lines are dropped; lines join with `\n` and the
  *     result carries no trailing newline. An unparseable/empty page
  *     extracts as the empty string, never an error.
  */
object HtmlCodec {

  private val blockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("html", "head", "body", "title", "p", "div", "br", "hr", "li",
      "ul", "ol", "table", "thead", "tbody", "tr", "td", "th",
      "h1", "h2", "h3", "h4", "h5", "h6", "nav", "header", "footer",
      "aside", "section", "article", "main", "blockquote", "pre", "form",
      "select", "option", "figure", "figcaption", "meta", "link",
      "dl", "dt", "dd", "caption").foreach(s.add)
    s
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == '\u00a0'

  /** Case-insensitive ASCII indexOf of `needle` in `hay` from `from`;
    * -1 when absent. Needle is lowercase ASCII by construction. */
  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val n = hay.length; val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var j = 0
      while (j < m && Character.toLowerCase(hay.charAt(i + j)) == needle.charAt(j))
        j += 1
      if (j == m) return i
      i += 1
    }
    -1
  }

  def text(html: String): String = {
    if (html == null) return null
    val n = html.length
    val out = new java.lang.StringBuilder()
    val line = new java.lang.StringBuilder()
    var pendingSpace = false

    def flushLine(): Unit = {
      if (line.length() > 0) {
        if (out.length() > 0) out.append('\n')
        out.append(line)
        line.setLength(0)
      }
      pendingSpace = false
    }

    def appendChar(c: Char): Unit = {
      if (isWs(c)) { if (line.length() > 0) pendingSpace = true }
      else {
        if (pendingSpace) { line.append(' '); pendingSpace = false }
        line.append(c)
      }
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n &&
            (Character.isLetter(html.charAt(i + 1)) || html.charAt(i + 1) == '/')) {
          var j = i + 1
          val closing = html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (Character.isLetterOrDigit(html.charAt(j))))
            j += 1
          val name = html.substring(nameStart, j).toLowerCase(Locale.ROOT)
          // scan to the tag's real end, honoring quoted attribute values
          var k = j
          var quote: Char = 0
          while (k < n && (quote != 0 || html.charAt(k) != '>')) {
            val ch = html.charAt(k)
            if (quote == 0 && (ch == '"' || ch == '\'')) quote = ch
            else if (quote == ch) quote = 0
            k += 1
          }
          val tagEnd = if (k < n) k + 1 else n
          if (!closing && (name == "script" || name == "style")) {
            flushLine()
            // WHATWG raw-text close: "</name" must be followed by '>',
            // '/', or ASCII whitespace — "</scriptfoo>" does NOT end a
            // script element and must not leak its body into text.
            var close = indexOfIgnoreCase(html, "</" + name, tagEnd)
            while (close >= 0 && {
                val after = close + 2 + name.length
                after < n && {
                  val ch = html.charAt(after)
                  ch != '>' && ch != '/' && ch != ' ' && ch != '\t' &&
                    ch != '\n' && ch != '\r' && ch != '\f'
                }
              }) close = indexOfIgnoreCase(html, "</" + name, close + 1)
            if (close < 0) i = n
            else {
              var g = close + 2 + name.length
              while (g < n && html.charAt(g) != '>') g += 1
              i = if (g < n) g + 1 else n
            }
          } else {
            if (blockTags.contains(name)) flushLine()
            i = tagEnd
          }
        } else {
          // a bare '<' that opens nothing is literal text
          appendChar(c); i += 1
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        var consumed = false
        if (semi > i && semi - i <= 12) {
          val body = html.substring(i + 1, semi)
          if (body.length > 1 && body.charAt(0) == '#') {
            val hex = body.length > 2 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')
            val digits = if (hex) body.substring(2) else body.substring(1)
            try {
              val cp = Integer.parseInt(digits, if (hex) 16 else 10)
              if (Character.isValidCodePoint(cp) && cp > 0) {
                Character.toChars(cp).foreach(appendChar)
                consumed = true
              }
            } catch { case _: NumberFormatException => }
          } else body match {
            case "amp"  => appendChar('&'); consumed = true
            case "lt"   => appendChar('<'); consumed = true
            case "gt"   => appendChar('>'); consumed = true
            case "quot" => appendChar('"'); consumed = true
            case "apos" => appendChar('\''); consumed = true
            case "nbsp" => appendChar(' '); consumed = true
            case _      =>
          }
        }
        if (consumed) i = semi + 1
        else { appendChar('&'); i += 1 }
      } else {
        appendChar(c); i += 1
      }
    }
    flushLine()
    out.toString
  }

  /** UTF8String adapter shared by the interpreted and codegen paths. */
  def textU8(html: UTF8String): UTF8String =
    if (html == null) null else UTF8String.fromString(text(html.toString))

  /** Entity-decode an attribute VALUE (same reference set as the text
    * walk, no whitespace collapse — attribute values keep their bytes). */
  private def decodeAttr(v: String): String = {
    if (v.indexOf('&') < 0) return v
    val out = new java.lang.StringBuilder(v.length)
    var i = 0
    val n = v.length
    while (i < n) {
      val c = v.charAt(i)
      if (c == '&') {
        val semi = v.indexOf(';', i + 1)
        var consumed = false
        if (semi > i && semi - i <= 12) {
          val body = v.substring(i + 1, semi)
          if (body.length > 1 && body.charAt(0) == '#') {
            val hex = body.length > 2 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')
            val digits = if (hex) body.substring(2) else body.substring(1)
            try {
              val cp = Integer.parseInt(digits, if (hex) 16 else 10)
              if (Character.isValidCodePoint(cp) && cp > 0) {
                out.appendCodePoint(cp); consumed = true
              }
            } catch { case _: NumberFormatException => }
          } else body match {
            case "amp"  => out.append('&'); consumed = true
            case "lt"   => out.append('<'); consumed = true
            case "gt"   => out.append('>'); consumed = true
            case "quot" => out.append('"'); consumed = true
            case "apos" => out.append('\''); consumed = true
            case _      =>
          }
        }
        if (consumed) i = semi + 1 else { out.append('&'); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** `html_links(html)` — the hrefs of the page's `<a>` elements, in
    * document order: the crawl-frontier / link-graph extraction step.
    * Same tag scanner as [[text]] (quoted attributes may contain `>`),
    * attribute names case-insensitive, values single- or double-quoted or
    * unquoted, character references decoded (`&amp;` is ubiquitous in real
    * hrefs); `<a>` elements without an href contribute nothing; raw-text
    * (script/style) and comment regions are skipped so a commented-out
    * link never enters the frontier. Unparseable input yields an empty
    * array, never an error. */
  def links(html: String): Array[String] = {
    if (html == null) return null
    val n = html.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n &&
            (Character.isLetter(html.charAt(i + 1)) || html.charAt(i + 1) == '/')) {
          var j = i + 1
          val closing = html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase(Locale.ROOT)
          var k = j
          var quote: Char = 0
          var href: String = null
          // attribute scan: name [= value]; values quoted or bare
          while (k < n && (quote != 0 || html.charAt(k) != '>')) {
            val ch = html.charAt(k)
            if (quote != 0) { if (ch == quote) quote = 0; k += 1 }
            else if (Character.isWhitespace(ch) || ch == '/') k += 1
            else {
              val as = k
              while (k < n && !Character.isWhitespace(html.charAt(k)) &&
                  html.charAt(k) != '=' && html.charAt(k) != '>' &&
                  html.charAt(k) != '/') k += 1
              val attr = html.substring(as, k).toLowerCase(Locale.ROOT)
              var ws = k
              while (ws < n && Character.isWhitespace(html.charAt(ws))) ws += 1
              var value: String = null
              if (ws < n && html.charAt(ws) == '=') {
                var vs = ws + 1
                while (vs < n && Character.isWhitespace(html.charAt(vs))) vs += 1
                if (vs < n && (html.charAt(vs) == '"' || html.charAt(vs) == '\'')) {
                  val q = html.charAt(vs)
                  val ve = html.indexOf(q, vs + 1)
                  if (ve < 0) { value = html.substring(vs + 1); k = n }
                  else { value = html.substring(vs + 1, ve); k = ve + 1 }
                } else {
                  val vstart = vs
                  var ve = vs
                  while (ve < n && !Character.isWhitespace(html.charAt(ve)) &&
                      html.charAt(ve) != '>') ve += 1
                  value = html.substring(vstart, ve); k = ve
                }
              }
              // empty hrefs (href="" or a truncated href=) carry no
              // frontier information — skipped, like a crawler would
              if (!closing && name == "a" && attr == "href" && value != null &&
                  value.nonEmpty && href == null)
                href = decodeAttr(value)
            }
          }
          val tagEnd = if (k < n) k + 1 else n
          if (!closing && (name == "script" || name == "style")) {
            val close = indexOfIgnoreCase(html, "</" + name, tagEnd)
            if (close < 0) i = n
            else {
              var g = close + 2 + name.length
              while (g < n && html.charAt(g) != '>') g += 1
              i = if (g < n) g + 1 else n
            }
          } else i = tagEnd
          if (href != null) out += href
        } else i += 1
      } else i += 1
    }
    out.toArray
  }

  def linksU8(html: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    if (html == null) return null
    val ls = links(html.toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ls.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  /** `url_canon(url)` — deterministic URL canonicalization, the dedup key
    * a crawl pipeline groups on before fetching or counting (RFC 3986
    * normalization + the common-crawl conventions):
    *   - scheme and host lowercased;
    *   - default ports dropped (http:80, https:443), others kept;
    *   - the fragment dropped;
    *   - tracking parameters removed (any key starting `utm_`,
    *     case-insensitive);
    *   - surviving query parameters sorted byte-lexicographically (the
    *     canonical order that makes `?b=2&a=1` and `?a=1&b=2` one URL);
    *   - an empty path becomes `/`.
    * Anything without a `scheme://` prefix (relative links, mailto,
    * garbage) is returned trimmed but otherwise untouched — a
    * canonicalizer must never invent structure. */
  def urlCanon(url: String): String = {
    if (url == null) return null
    val u = url.trim
    val ss = u.indexOf("://")
    if (ss <= 0) return u
    val scheme = u.substring(0, ss).toLowerCase(Locale.ROOT)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
      return u
    val rest = u.substring(ss + 3)
    var authEnd = 0
    while (authEnd < rest.length && rest.charAt(authEnd) != '/' &&
        rest.charAt(authEnd) != '?' && rest.charAt(authEnd) != '#') authEnd += 1
    val authority = rest.substring(0, authEnd)
    val tail = rest.substring(authEnd)
    val colon = authority.lastIndexOf(':')
    val (host, port) =
      if (colon >= 0 && colon < authority.length - 1 &&
          authority.substring(colon + 1).forall(_.isDigit))
        (authority.substring(0, colon), authority.substring(colon + 1))
      else (authority, "")
    val hostL = host.toLowerCase(Locale.ROOT)
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    val hashAt = tail.indexOf('#')
    val noFrag = if (hashAt < 0) tail else tail.substring(0, hashAt)
    val qAt = noFrag.indexOf('?')
    val path0 = if (qAt < 0) noFrag else noFrag.substring(0, qAt)
    val query0 = if (qAt < 0) "" else noFrag.substring(qAt + 1)
    val path = if (path0.isEmpty) "/" else path0
    val params = query0.split("&").filter(_.nonEmpty).filterNot { p =>
      val k = p.indexOf('=') match { case -1 => p; case e => p.substring(0, e) }
      k.toLowerCase(Locale.ROOT).startsWith("utm_")
    }.sorted
    val sb = new java.lang.StringBuilder(scheme).append("://").append(hostL)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (params.nonEmpty) sb.append('?').append(params.mkString("&"))
    sb.toString
  }

  def urlCanonU8(url: UTF8String): UTF8String =
    if (url == null) null else UTF8String.fromString(urlCanon(url.toString))
}

/** Catalyst expression for [[HtmlCodec.links]] — codegen'd, null-safe. */
case class HtmlLinks(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "html_links"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    HtmlCodec.linksU8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HtmlCodec.linksU8($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Catalyst expression for [[HtmlCodec.urlCanon]] — codegen'd, null-safe. */
case class UrlCanon(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_canon"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    HtmlCodec.urlCanonU8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HtmlCodec.urlCanonU8($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Catalyst expression for [[HtmlCodec.text]] — codegen'd, null-safe. */
case class HtmlText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_text"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    HtmlCodec.textU8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HtmlCodec.textU8($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
