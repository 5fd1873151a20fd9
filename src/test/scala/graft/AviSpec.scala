package graft

import graft.functions.{AviCodec, GraftFunctions}
import org.apache.spark.sql.functions._

/** The video lane (x80): avi_pack must emit a structurally complete AVI 1.0
  * file (hdrl/strl headers, movi chunks, idx1 index with keyframe flags) and
  * avi_frame_sample must be a real container parser — nested list walk,
  * four-way frame-count validation, index-driven seeks with the
  * absolute-offset writer variant, rejection of poisoned payloads — not a
  * fixed-offset peek. */
class AviSpec extends SparkSpec {

  private def frames(n: Int, w: Int = 2, h: Int = 2): Array[Array[Byte]] =
    Array.tabulate(n)(f => Array.tabulate(w * h)(p => ((f * 10 + p) % 256).toByte))

  private def statsOf(bytes: Array[Byte], every: Int)
      : Option[(Int, Int, Int, Int, Int, Int, Int, Long, Int)] =
    Option(AviCodec.frameSample(bytes, every)).map(r => (r.getInt(0),
      r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
      r.getInt(6), r.getLong(7), r.getInt(8)))

  private def patchInt(bytes: Array[Byte], pos: Int, v: Int): Array[Byte] = {
    val out = bytes.clone()
    java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(pos, v)
    out
  }

  private def indexOfFourcc(bytes: Array[Byte], tag: String): Int = {
    val t = tag.getBytes("US-ASCII")
    bytes.indices.find(i => i + 4 <= bytes.length &&
      bytes(i) == t(0) && bytes(i + 1) == t(1) &&
      bytes(i + 2) == t(2) && bytes(i + 3) == t(3)).get
  }

  test("pack → frame_sample is the identity on headers, counts and payloads") {
    val fs = frames(5)
    val avi = AviCodec.pack(fs, 25, 2, 2, 2)
    // every=2 samples frames 0,2,4; keyEvery=2 flags frames 0,2,4
    val sampled = Seq(0, 2, 4).flatMap(fs(_)).map(_ & 0xFF)
    assert(statsOf(avi, 2) === Some((2, 2, 40000, 25, 5, 3, 3,
      sampled.map(_.toLong).sum, sampled.max)))
    // every=1 touches every frame
    val all = fs.flatten.map(_ & 0xFF)
    assert(statsOf(avi, 1) === Some((2, 2, 40000, 25, 5, 3, 5,
      all.map(_.toLong).sum, all.max)))
  }

  test("an unknown top-level chunk between hdrl and movi is skipped") {
    val avi = AviCodec.pack(frames(3), 10, 2, 2, 4)
    val moviHdr = indexOfFourcc(avi, "movi") - 8 // the LIST header before it
    val junk = "JUNKgraft".getBytes("US-ASCII")  // odd payload: needs a pad
    val out = new java.io.ByteArrayOutputStream()
    out.write(avi, 0, moviHdr)
    val hdr = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("JUNK".getBytes("US-ASCII")).putInt(junk.length - 4)
    out.write(hdr.array()); out.write(junk, 4, junk.length - 4); out.write(0)
    out.write(avi, moviHdr, avi.length - moviHdr)
    val spliced = patchInt(out.toByteArray, 4, out.size() - 8)
    assert(statsOf(spliced, 1) === statsOf(avi, 1),
      "a JUNK chunk must not change the statistics")
  }

  test("the absolute-offset idx1 writer variant parses identically") {
    val avi = AviCodec.pack(frames(4), 20, 2, 2, 3)
    val moviFcc = indexOfFourcc(avi, "movi")
    val idxData = indexOfFourcc(avi, "idx1") + 8
    val bb = java.nio.ByteBuffer.wrap(avi)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rewritten = avi.clone()
    val rb = java.nio.ByteBuffer.wrap(rewritten)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 4).foreach { i =>
      val p = idxData + i * 16 + 8
      rb.putInt(p, moviFcc + bb.getInt(p)) // relative → absolute file offset
    }
    assert(statsOf(rewritten, 1) === statsOf(avi, 1),
      "absolute idx1 offsets must be auto-detected like real players do")
  }

  test("poisoned payloads return NULL, never crash") {
    val avi = AviCodec.pack(frames(4), 20, 2, 2, 2)
    assert(statsOf(avi.take(40), 1) === None, "truncated")
    assert(statsOf(avi, 0) === None, "non-positive sampling step")
    val notAvi = avi.clone(); notAvi(8) = 'W'.toByte
    assert(statsOf(notAvi, 1) === None, "wrong RIFF form type")
    // avih.dwTotalFrames lives at RIFF(12)+LIST(8)+hdrl(4)+avih hdr(8)+16
    assert(statsOf(patchInt(avi, 48, 5), 1) === None,
      "frame-count disagreement between avih and movi/idx1")
    val strf = indexOfFourcc(avi, "strf")
    assert(statsOf(patchInt(avi, strf + 8 + 16, 0x32315659), 1) === None,
      "unknown biCompression (YV12) must be rejected, not misread")
    val idxData = indexOfFourcc(avi, "idx1") + 8
    assert(statsOf(patchInt(avi, idxData + 12, 3), 1) === None,
      "an idx1 entry whose length is not width*height")
    assert(statsOf(patchInt(avi, idxData + 8, 9999), 1) === None,
      "an idx1 offset pointing at no chunk header (both conventions)")
    // a crafted near-Int.MaxValue chunk size must not wrap the bound check
    assert(statsOf(patchInt(avi, 16, Int.MaxValue - 4), 1) === None,
      "overflowing chunk size")
  }

  test("the DataFrame lane encodes, samples and null-guards in BOTH codegen modes") {
    val df = spark.range(3).selectExpr("id",
      // id 0: 4 valid 2×2 frames; id 1: a wrong-size frame; id 2: fps 0
      """CASE WHEN id = 0 THEN array(X'00010203', X'0a0b0c0d', X'10111213', X'20212223')
             WHEN id = 1 THEN array(X'0001', X'0a0b0c0d', X'10111213', X'20212223')
             ELSE array(X'00010203') END AS fr""",
      "CASE WHEN id = 2 THEN 0 ELSE 10 END AS fps")
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val rows = df.select(col("id"),
            GraftFunctions.avi_frame_sample(
              GraftFunctions.avi_pack(col("fr"), col("fps"), lit(2), lit(2),
                lit(2)),
              lit(2)).as("st"))
          .orderBy("id").collect()
        assert(!rows(0).isNullAt(1), s"valid stack must parse ($mode)")
        val st = rows(0).getStruct(1)
        // frames 0,2 sampled: bytes 0..3 and 16..19
        assert(st.getInt(4) === 4 && st.getInt(6) === 2, s"counts ($mode)")
        assert(st.getLong(7) ===
          Seq(0x00, 0x01, 0x02, 0x03, 0x10, 0x11, 0x12, 0x13).sum.toLong,
          s"sampled byte sum ($mode)")
        assert(rows(1).isNullAt(1), s"wrong-size frame → NULL ($mode)")
        assert(rows(2).isNullAt(1), s"fps 0 → NULL ($mode)")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
