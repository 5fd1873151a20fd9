package graft

import graft.functions.{GraftFunctions, WavCodec}
import org.apache.spark.sql.functions._

/** The WAV lane (x70): wav_pcm16 must emit files an INDEPENDENT decoder
  * (the JDK's javax.sound audio stack) accepts bit-for-bit, and wav_stats
  * must be a real RIFF parser — chunk walk, stereo, word alignment,
  * rejection of non-PCM and poisoned payloads — not a fixed-offset peek. */
class WavSpec extends SparkSpec {

  private def statsOf(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int, Long)] =
    Option(WavCodec.stats(bytes)).map(r => (r.getInt(0), r.getInt(1),
      r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getLong(6)))

  test("encoded WAV round-trips through the JDK's independent audio decoder") {
    val samples = Array(0, 1000, -1000, 32767, -32768, 12345, -12345, 7)
    val wav = WavCodec.encode(samples, 8000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getEncoding ===
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
    assert(fmt.getSampleRate === 8000f)
    assert(fmt.getChannels === 1)
    assert(fmt.getSampleSizeInBits === 16)
    assert(in.getFrameLength === samples.length.toLong)
    val data = in.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val decoded = Array.fill(samples.length)(bb.getShort().toInt)
    assert(decoded === samples,
      "an independent decoder must recover the exact sample stream")
  }

  test("wav_stats computes exact statistics and matches a direct fold") {
    val samples = Array(5, -3, 0, 32767, -32768, 100, -100, 100)
    val Some((sr, ch, n, peak, clipped, zc, sumSq)) =
      statsOf(WavCodec.encode(samples, 44100))
    assert((sr, ch, n) === ((44100, 1, 8)))
    assert(peak === 32768)
    assert(clipped === 2)
    // signs: + - 0(+) + - + - + → flips at 1,2(0 counts as non-neg),3?
    // neg flags: F T F F T F T F → changes at i=1,2,4,5,6,7 = 6
    assert(zc === 6)
    assert(sumSq === samples.map(s => s.toLong * s).sum)
  }

  test("the chunk walk skips unknown chunks and handles word alignment") {
    val samples = Array(10, -20, 30)
    val plain = WavCodec.encode(samples, 16000)
    // splice an odd-sized LIST chunk between fmt and data (word-aligned
    // with a pad byte, per the RIFF spec)
    val payload = "INFOgraft".getBytes("US-ASCII") // 9 bytes: odd
    val out = new java.io.ByteArrayOutputStream()
    out.write(plain, 0, 36)                  // RIFF..fmt chunk end
    val hdr = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("LIST".getBytes("US-ASCII")).putInt(payload.length)
    out.write(hdr.array()); out.write(payload); out.write(0) // pad byte
    out.write(plain, 36, plain.length - 36)  // data chunk
    val spliced = out.toByteArray
    // fix the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    assert(statsOf(spliced) === statsOf(plain),
      "a LIST chunk between fmt and data must not change the statistics")
  }

  test("stereo PCM16 parses with frames = samples / channels") {
    // hand-build a 2-channel file: 4 frames of (L, R)
    val frames = Array((100, -100), (200, -200), (32767, -32768), (0, 50))
    val dataLen = frames.length * 4
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1); bb.putShort(2); bb.putInt(22050)
    bb.putInt(22050 * 4); bb.putShort(4); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    frames.foreach { case (l, r) => bb.putShort(l.toShort); bb.putShort(r.toShort) }
    val Some((sr, ch, n, peak, clipped, zc, _)) = statsOf(bb.array())
    assert((sr, ch, n) === ((22050, 2, 4)))
    assert(peak === 32768 && clipped === 2)
    // PER-CHANNEL crossings: L = 100,200,32767,0 (none), R = -100,-200,
    // -32768,50 (one). Interleaved counting would report 7 — the sign
    // flips BETWEEN channels, not a signal property.
    assert(zc === 1, s"zero crossings must be per-channel, got $zc")
  }

  test("a constant +L/-R stereo signal has zero crossings") {
    val dataLen = 4 * 4
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1); bb.putShort(2); bb.putInt(8000)
    bb.putInt(8000 * 4); bb.putShort(4); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (1 to 4).foreach { _ => bb.putShort(100); bb.putShort(-100) }
    val Some((_, _, _, _, _, zc, _)) = statsOf(bb.array())
    assert(zc === 0, s"constant channels have no crossings, got $zc")
  }

  test("poisoned payloads return null, never crash") {
    assert(statsOf(Array.emptyByteArray).isEmpty)
    assert(statsOf("not a wav at all, just text".getBytes("UTF-8") ++
      new Array[Byte](40)).isEmpty)
    val good = WavCodec.encode(Array(1, 2, 3), 8000)
    assert(statsOf(good.take(30)).isEmpty, "truncated header")
    // declared data size larger than the payload
    val lying = good.clone()
    java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 1 << 20)
    assert(statsOf(lying).isEmpty, "declared chunk size beyond the payload")
    // IEEE-float format tag (3) is not PCM16
    val float32 = good.clone()
    java.nio.ByteBuffer.wrap(float32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(20, 3)
    assert(statsOf(float32).isEmpty, "non-PCM format tag")
    // a near-Int.MaxValue declared chunk size must not wrap the bound
    // check negative and walk past the buffer
    val wrap = good.clone()
    java.nio.ByteBuffer.wrap(wrap).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue - 1)
    assert(statsOf(wrap).isEmpty, "overflowing declared size")
  }

  test("the DataFrame lane encodes, parses and clamps inside codegen") {
    import spark.implicits._
    val df = Seq((1L, Seq(40000, -40000, 1000))).toDF("id", "s")
      .select(col("id"), GraftFunctions.wav_stats(
        GraftFunctions.wav_pcm16(col("s"), lit(8000))).as("st"))
      .select(col("st.peak"), col("st.clipped"), col("st.n_samples"))
    val row = df.collect().head
    assert(row.getInt(0) === 32768 && row.getInt(1) === 2 && row.getInt(2) === 3,
      "out-of-range samples clamp to full scale (and count as clipped)")
  }

  test("a null sample element yields NULL, identically in codegen and interpreted") {
    import spark.implicits._
    // before the encodeChecked fix this DIVERGED: GenericArrayData (the
    // interpreted/local-relation path) threw NPE from toIntArray while
    // UnsafeArrayData silently encoded the null as sample 0
    val df = Seq((1L, Seq[Integer](100, null, 300)), (2L, Seq[Integer](1, 2)))
      .toDF("id", "s")
      .select(col("id"),
        GraftFunctions.wav_pcm16(col("s").cast("array<int>"), lit(8000)).as("w"))
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val rows = df.orderBy("id").collect()
        assert(rows(0).isNullAt(1), s"null element must yield NULL ($codegen)")
        assert(!rows(1).isNullAt(1), s"clean array must encode ($codegen)")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
