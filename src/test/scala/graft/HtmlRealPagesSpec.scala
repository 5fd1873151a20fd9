package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.functions.{CharsetCodec, HtmlCodec, RobotsCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Robustness pass for the crawl-ingestion walkers over REAL pages
  * (VERDICT r15 #5): the x87/x88/x90/x92 expressions are oracle-proven on
  * synthesized trap pages; this suite drives them over the genuine
  * documentation HTML shipped in the container image (/usr/share/doc —
  * texinfo/docbook/doxygen output, real-world markup the synthesizer never
  * generates: nested tables, anchors with ids, DTD declarations, author
  * entities), plus deterministic mutations (truncation at arbitrary byte
  * offsets, byte flips) standing in for the torn payloads a crawler reads.
  * The pages are READ from the host at test time, never vendored — the
  * suite skips gracefully on hosts without them.
  *
  * Properties pinned:
  *   1. never throw, never NULL, on every page and every mutation;
  *   2. byte-budget bounded: |text| ≤ |page| (tags and entities only
  *      shrink), |links| bounded by the page's '<a' count;
  *   3. idempotent where the contract promises it: url_canon∘url_canon =
  *      url_canon always; html_text is a fixpoint on pages whose extracted
  *      text contains no '<' (re-extraction of decoded entities like
  *      &lt;code&gt; legitimately differs — that is HTML, not a bug);
  *   4. robots_allowed treats arbitrary real-world text fed as robots.txt
  *      as a no-crawl-restriction document: never throws, and with no
  *      parsable User-agent group it must allow;
  *   5. decode_charset survives the raw bytes of every page (its meta
  *      prescan or the UTF-8 fallback), and BOM-prefixed re-encodings
  *      round-trip.
  */
class HtmlRealPagesSpec extends AnyFunSuite {

  private val root = Paths.get("/usr/share/doc")

  /** Up to 120 real pages ≤ 256 KiB, deterministic order. */
  private lazy val pages: Seq[(Path, Array[Byte])] = {
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val stream = Files.walk(root)
      try stream.iterator().asScala
        .filter(p => p.toString.endsWith(".html") && Files.isRegularFile(p))
        .filter(p => Files.size(p) <= 256 * 1024 && Files.size(p) > 0)
        .toSeq.sortBy(_.toString).take(120)
        .map(p => (p, Files.readAllBytes(p)))
      finally stream.close()
    }
  }

  private def text(b: Array[Byte]): String =
    HtmlCodec.text(new String(b, "UTF-8"))

  test("real pages: html_text never throws, never NULL, output is " +
      "byte-budget bounded") {
    assume(pages.nonEmpty, "host has no /usr/share/doc HTML corpus")
    pages.foreach { case (p, bytes) =>
      val out = text(bytes)
      assert(out != null, s"$p: NULL extraction")
      assert(out.length <= bytes.length,
        s"$p: extraction GREW (${out.length} > ${bytes.length})")
    }
  }

  test("real pages: html_text is a per-line fixpoint when a line carries " +
      "no '<' or '&'") {
    assume(pages.nonEmpty, "host has no /usr/share/doc HTML corpus")
    // line structure comes from block TAGS, which extraction removes, so
    // whole-document re-extraction legitimately joins lines; the honest
    // fixpoint is per line: an extracted line is already tag-free,
    // entity-free (modulo decoded ones) and whitespace-collapsed, so
    // re-extracting it must be the identity
    var eligible = 0
    pages.foreach { case (p, bytes) =>
      text(bytes).split('\n').foreach { line =>
        if (line.nonEmpty && !line.contains('<') && !line.contains('&')) {
          eligible += 1
          assert(HtmlCodec.text(line) === line,
            s"$p: re-extraction drifted on line '$line'")
        }
      }
    }
    assert(eligible >= 1000,
      s"fixpoint check exercised only $eligible lines — corpus no longer " +
        "meaningful")
  }

  test("real pages: html_links never throws; url_canon is idempotent on " +
      "every extracted link") {
    assume(pages.nonEmpty, "host has no /usr/share/doc HTML corpus")
    var links = 0
    pages.foreach { case (p, bytes) =>
      val html = new String(bytes, "UTF-8")
      val hrefs = HtmlCodec.links(html)
      assert(hrefs != null, s"$p: NULL links")
      val anchorCount = "<a".r.findAllIn(html.toLowerCase).size
      assert(hrefs.size <= anchorCount + 1,
        s"$p: more links (${hrefs.size}) than anchors ($anchorCount)")
      hrefs.foreach { h =>
        val c1 = HtmlCodec.urlCanon(h)
        assert(HtmlCodec.urlCanon(c1) === c1, s"$p: url_canon not idempotent on '$h'")
        links += 1
      }
    }
    assert(links > 100, s"corpus yielded only $links links — not meaningful")
  }

  test("mutations: truncations and byte flips never throw across the walkers") {
    assume(pages.nonEmpty, "host has no /usr/share/doc HTML corpus")
    val rng = new scala.util.Random(42) // deterministic
    pages.take(40).foreach { case (p, bytes) =>
      (1 to 3).foreach { _ =>
        val cut = bytes.take(rng.nextInt(bytes.length))
        val s = new String(cut, "UTF-8")
        assert(HtmlCodec.text(s) != null, s"$p: truncation threw/NULLed text")
        assert(HtmlCodec.links(s) != null, s"$p: truncation broke links")
        val flipped = bytes.clone()
        val i = rng.nextInt(flipped.length)
        flipped(i) = (flipped(i) ^ 0x20).toByte
        assert(HtmlCodec.text(new String(flipped, "UTF-8")) != null,
          s"$p: byte flip broke text")
      }
    }
  }

  test("real-world text fed as robots.txt: never throws; no parsable group " +
      "means allowed") {
    assume(pages.nonEmpty, "host has no /usr/share/doc HTML corpus")
    pages.take(40).foreach { case (p, bytes) =>
      val s = new String(bytes, "UTF-8")
      // real HTML rarely contains 'User-agent:' lines; whether or not a
      // stray one parses, the call must not throw and must return a Boolean
      val v = RobotsCodec.allowed(s, "graftbot", "/any/path")
      if (!s.toLowerCase.contains("user-agent"))
        assert(v, s"$p: no user-agent group must mean allowed")
    }
  }

  test("decode_charset survives every real page's raw bytes; BOM " +
      "re-encodings round-trip") {
    assume(pages.nonEmpty, "host has no /usr/share/doc HTML corpus")
    var decoded = 0
    pages.foreach { case (p, bytes) =>
      // no transport declaration: meta prescan or strict-UTF-8 fallback;
      // a non-UTF-8 legacy page may legitimately answer NULL (poisoned),
      // but must never throw
      val out = CharsetCodec.decode(bytes, "")
      if (out != null) {
        decoded += 1
        // BOM re-encodings of the decoded text round-trip exactly
        val be = Array(0xFE.toByte, 0xFF.toByte) ++ out.getBytes("UTF-16BE")
        assert(CharsetCodec.decode(be, "") === out, s"$p: UTF-16BE BOM drift")
      }
    }
    assert(decoded >= pages.size / 2,
      s"only $decoded/${pages.size} real pages decoded — fallback too strict")
  }
}
