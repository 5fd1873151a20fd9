package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.{GraftFunctions, HtmlCodec}
import org.apache.spark.sql.functions._

/** Unit contract for [[HtmlCodec.text]] (the x87/s69 extraction walk):
  * the documented semantics on hand-built pages, the crawl-soup traps, and
  * hostile/garbage inputs that must degrade to text, never throw. */
class HtmlTextSpec extends SparkSpec {

  private def t(html: String): String = HtmlCodec.text(html)

  test("basic page: blocks become lines, inline tags vanish") {
    assert(t("<html><body><h1>Ti</h1><p>Hello <b>wor</b>ld</p></body></html>")
      === "Ti\nHello world")
  }

  test("script/style raw text is excised, embedded close-alikes stay dead") {
    assert(t("""<p>a</p><script>var s = "</div>"; if (1 < 2) {}</script><p>b</p>""")
      === "a\nb")
    assert(t("<style>p > span { color: red }</style><p>x</p>") === "x")
    // case-insensitive close tag
    assert(t("<SCRIPT>junk</ScRiPt><p>y</p>") === "y")
    // unterminated raw text swallows the rest
    assert(t("<p>z</p><script>never closed <p>gone</p>") === "z")
    // WHATWG: "</scriptfoo>" is NOT a close tag — the name must be followed
    // by '>', '/', or whitespace; script content must stay excised past it
    // (ADVICE r15).
    assert(t("""<script>var a = "</scriptfoo>"; leak?</script><p>ok</p>""")
      === "ok")
    assert(t("<style>p</stylesheet> { x } </style><p>q</p>") === "q")
    // whitespace / solidus after the name DO close per the spec
    assert(t("<script>s</script ><p>w1</p>") === "w1")
    assert(t("<script>s</script/><p>w2</p>") === "w2")
    assert(t("<script>s</script\n><p>w3</p>") === "w3")
  }

  test("comments and declarations drop, tags inside comments included") {
    assert(t("<!DOCTYPE html><p>a</p><!-- <p>not me</p> --><p>b</p>")
      === "a\nb")
    assert(t("<!-- unterminated <p>gone") === "")
    assert(t("<?xml version=\"1.0\"?><p>ok</p>") === "ok")
  }

  test("quoted attributes may contain > and quotes") {
    assert(t("""<a href="/x" title="a > b">link</a> tail""") === "link tail")
    assert(t("""<a title='it"s > fine'>q</a>""") === "q")
  }

  test("entities: named, decimal, hex, nbsp, and non-entities stay literal") {
    assert(t("<p>&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos;</p>")
      === "<tag> & \"q\" 'a'")
    assert(t("<p>&#72;&#101;&#x78;</p>") === "Hex")
    assert(t("<p>a&nbsp;b</p>") === "a b")
    assert(t("<p>AT&T and R&D; fish &chips;</p>") === "AT&T and R&D; fish &chips;")
    // supplementary plane codepoint round-trips
    assert(t("<p>&#x1F600;</p>") === new String(Character.toChars(0x1F600)))
  }

  test("whitespace collapses, lines trim, empty lines drop") {
    assert(t("<p>\n\t  a   b\t\tc  \n</p>") === "a b c")
    assert(t("<p>  </p><p>x</p><div>\t</div>") === "x")
    // literal nbsp characters collapse like spaces (corpus cleaning)
    assert(t("<p>a" + "\u00a0\u00a0" + "b</p>") === "a b")
  }

  test("garbage never throws: bare <, unterminated tags, empty, null") {
    assert(t("1 < 2 and 3 > 2") === "1 < 2 and 3 > 2")
    assert(t("<p>trailing open <") === "trailing open <")
    assert(t("<p>cut mid-tag <a href=\"x") === "cut mid-tag")
    assert(t("") === "")
    // "<>" is literal text; "<//>" parses as an empty-named inline tag
    assert(t("<><//><p>ok</p>") === "<>\nok")
    assert(HtmlCodec.text(null) === null)
  }

  private def ls(html: String): Seq[String] = HtmlCodec.links(html).toSeq
  private def uc(u: String): String = HtmlCodec.urlCanon(u)

  test("html_links: document order, quoting styles, entity decode, no-href skip") {
    assert(ls("""<a href="/x">a</a><p><a href='/y'>b</a></p><a class="z">c</a>""")
      === Seq("/x", "/y"))
    assert(ls("""<a href="/p?a=1&amp;b=2">e</a>""") === Seq("/p?a=1&b=2"))
    assert(ls("""<a HREF="/up">case</a><a href=/bare>bare</a>""")
      === Seq("/up", "/bare"))
    // attribute order and other attributes don't matter
    assert(ls("""<a rel="next" title="x > y" href="/q">t</a>""") === Seq("/q"))
  }

  test("html_links: script/comment anchors never enter the frontier") {
    assert(ls("""<script>var s = "<a href='/dead'>";</script><a href="/live">x</a>""")
      === Seq("/live"))
    assert(ls("""<!-- <a href="/dead">gone</a> --><a href="/live">x</a>""")
      === Seq("/live"))
    assert(ls("") === Seq.empty)
    assert(ls("<a href=") === Seq.empty)
    assert(HtmlCodec.links(null) === null)
  }

  test("url_canon: case, default ports, fragments, trackers, param order") {
    assert(uc("https://WWW.Example.COM:443/home?utm_source=feed&x=1#top")
      === "https://www.example.com/home?x=1")
    assert(uc("HTTP://Example.com/doc/5?b=2&utm_campaign=z&a=1")
      === "http://example.com/doc/5?a=1&b=2")
    // non-default port kept; empty path becomes /
    assert(uc("https://cdn.example.com:8080/a.png?v=3")
      === "https://cdn.example.com:8080/a.png?v=3")
    assert(uc("http://h.example:80") === "http://h.example/")
    // only utm_* params drop; all-params-dropped removes the '?'
    assert(uc("https://a.b/p?utm_a=1&UTM_b=2") === "https://a.b/p")
    // path case and param values preserved
    assert(uc("https://A.B/Path/File?Z=9&a=2") === "https://a.b/Path/File?Z=9&a=2")
  }

  test("url_canon: relative links, mailto and garbage pass through trimmed") {
    assert(uc("/relative/path?x=1") === "/relative/path?x=1")
    assert(uc("mailto:a@b.c") === "mailto:a@b.c")
    assert(uc("  https://x.y/z  ") === "https://x.y/z")
    assert(uc("not a url") === "not a url")
    assert(uc("://nohost") === "://nohost")
    assert(HtmlCodec.urlCanon(null) === null)
  }

  test("expression: codegen and interpreted agree over the corpus pages") {
    val docs = Tables.table(spark, sf, "documents")
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .limit(64)
    val page = PipelineShared.htmlPage
    val a = docs.select(col("doc_id"),
      GraftFunctions.html_text(page).as("e")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a.nonEmpty)
    a.values.foreach { e =>
      assert(!e.contains("var n ="), "script content must be excised")
      assert(!e.contains("margin"), "style content must be excised")
      assert(!e.contains("comment trap"), "comments must drop")
      assert(!e.contains("  "), "no double spaces after normalization")
      assert(e.contains("Home | About"), "nav line must extract")
    }
    // interpreted path (direct eval through HtmlCodec) must match codegen
    val raw = docs.select(col("doc_id"), page.as("html")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    raw.foreach { case (id, html) =>
      assert(HtmlCodec.text(html) === a(id),
        s"codegen/interpreted divergence on doc $id")
    }
  }
}
