package graft

import graft.functions.WarcCodec
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the WARC/1.0 container codec (x91's lanes). */
class WarcSpec extends AnyFunSuite {

  private def rec(wtype: String, uri: String, ts: Long, payload: String) =
    WarcCodec.record(wtype, uri, ts, payload.getBytes("UTF-8"))

  test("encode→extract is the identity on every payload byte") {
    val a = rec("request", "https://x.y/p", 1723700000000L, "GET /p")
    val b = rec("response", "https://x.y/p", 1723700000000L,
      "<html><p>hi \u00e9\u4e2d</p></html>")
    val got = WarcCodec.extract(a ++ b)
    assert(got != null && got.numElements() === 2)
    val r0 = got.getStruct(0, 4)
    val r1 = got.getStruct(1, 4)
    assert(r0.getUTF8String(0).toString === "request")
    assert(r1.getUTF8String(0).toString === "response")
    assert(r0.getUTF8String(1).toString === "https://x.y/p")
    assert(new String(r0.getBinary(3), "UTF-8") === "GET /p")
    assert(new String(r1.getBinary(3), "UTF-8")
      === "<html><p>hi \u00e9\u4e2d</p></html>")
    assert(r1.getInt(2) === "<html><p>hi \u00e9\u4e2d</p></html>"
      .getBytes("UTF-8").length, "Content-Length counts BYTES, not chars")
  }

  test("payloads containing CRLFCRLF do not split records (length-framed)") {
    val tricky = "a\r\n\r\nb\r\n\r\nc"
    val w = rec("response", "u://x", 0L, tricky)
    val got = WarcCodec.extract(w)
    assert(got.numElements() === 1)
    assert(new String(got.getStruct(0, 4).getBinary(3), "UTF-8") === tricky)
  }

  test("empty payload round-trips; WARC-Date is fixed-width UTC") {
    val w = rec("request", "u://x", 1723700123999L, "")
    assert(new String(w, "UTF-8").contains("WARC-Date: 2024-08-15T05:35:23Z"),
      new String(w, "UTF-8"))
    assert(WarcCodec.extract(w).numElements() === 1)
  }

  test("malformation degrades to NULL, never a crash") {
    val good = rec("request", "u://x", 0L, "GET /")
    assert(WarcCodec.extract("HTTP/1.1 not warc\r\n\r\n".getBytes) == null)
    assert(WarcCodec.extract(good.dropRight(1)) == null,
      "truncated terminator")
    assert(WarcCodec.extract(good.dropRight(8)) == null,
      "truncated payload")
    val noLen = ("WARC/1.0\r\nWARC-Type: request\r\n" +
      "WARC-Target-URI: u://x\r\n\r\npayload\r\n\r\n").getBytes
    assert(WarcCodec.extract(noLen) == null, "missing Content-Length")
    assert(WarcCodec.extract(null) == null)
    assert(WarcCodec.extract(Array.emptyByteArray).numElements() === 0,
      "an empty shard is zero records, not an error")
  }

  test("hostile Content-Length near Int.MaxValue is NULL, not a crash") {
    // pStart + clen + 4 would wrap negative in int arithmetic and sail
    // past the bounds guard into copyOfRange (ADVICE r15) — the long-math
    // check must flag the shard malformed instead.
    val w = ("WARC/1.0\r\nWARC-Type: request\r\n" +
      "WARC-Target-URI: u://x\r\nContent-Length: 2147483640\r\n\r\n" +
      "ok\r\n\r\n").getBytes
    assert(WarcCodec.extract(w) == null)
    val w2 = ("WARC/1.0\r\nWARC-Type: request\r\n" +
      "WARC-Target-URI: u://x\r\nContent-Length: " + Int.MaxValue +
      "\r\n\r\nok\r\n\r\n").getBytes
    assert(WarcCodec.extract(w2) == null)
  }

  test("header names parse case-insensitively") {
    val w = ("WARC/1.0\r\nwarc-type: request\r\n" +
      "WARC-TARGET-URI: u://x\r\ncontent-length: 2\r\n\r\nok\r\n\r\n").getBytes
    val got = WarcCodec.extract(w)
    assert(got.numElements() === 1)
    assert(new String(got.getStruct(0, 4).getBinary(3), "UTF-8") === "ok")
  }
}
