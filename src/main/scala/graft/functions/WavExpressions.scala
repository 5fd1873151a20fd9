package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** `wav_pcm16(samples, sampleRate)` — encode an int array as a REAL
  * RIFF/WAVE file: canonical 44-byte header (PCM format tag 1, mono,
  * 16-bit) plus little-endian int16 sample data, exactly the layout every
  * audio tool writes (the format is public: RIFF chunks + the PCM fmt
  * block from the Multimedia Programming Interface spec). Samples clamp to
  * the int16 range. The audio twin of AvroEncode: it exists so the DECODE
  * lane ([[WavStats]]) can be proven against genuinely-encoded bytes —
  * encode→parse must be the identity on the sample stream, which the
  * DuckDB oracle checks by computing the same statistics from the raw
  * sample definition without the WAV round trip. */
case class WavEncodePcm16(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "wav_pcm16"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(ArrayType(IntegerType), IntegerType)

  // null SAMPLES (array elements) → NULL result, mirroring wav_stats'
  // poisoned-payload contract. Deliberately not toIntArray(): on a
  // null-bearing array GenericArrayData throws NPE while UnsafeArrayData
  // silently yields 0 — interpreted and codegen paths would diverge.
  override def nullSafeEval(samples: Any, rate: Any): Any =
    WavCodec.encodeChecked(samples.asInstanceOf[ArrayData],
      rate.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, r) => s"""
      ${ev.value} = graft.functions.WavCodec.encodeChecked($s, $r);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** `wav_stats(bytes)` — parse a RIFF/WAVE payload (real chunk walk: "fmt "
  * anywhere before "data", unknown chunks skipped by their declared size,
  * word-aligned, PCM 16-bit only) and return the audio-QA statistics a
  * training-data pipeline gates on, all EXACT integers so they survive any
  * cross-engine comparison:
  *
  *   sample_rate, channels, n_samples (frames),
  *   peak        = max |s|                  (digital headroom),
  *   clipped     = #{s = ±full scale}       (clipping detector),
  *   zero_cross  = #{i : sign(s_i) ≠ sign(s_{i-1})}  (spectral proxy),
  *   sum_sq      = Σ s²  as int64           (exact energy; RMS = √(Σs²/n)
  *                                           downstream — IEEE sqrt is
  *                                           correctly rounded, so even the
  *                                           derived RMS is bit-portable).
  *
  * Returns NULL for payloads that are not parseable PCM16 WAV — the QA
  * lane's "undecodable" flag, never a crash on a poisoned blob. */
case class WavStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = WavCodec.statsType
  override def nullable: Boolean = true
  override def prettyName: String = "wav_stats"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(BinaryType)

  override def nullSafeEval(v: Any): Any =
    WavCodec.stats(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavCodec.stats($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WavCodec {
  val statsType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("clipped", IntegerType, nullable = false),
    StructField("zero_cross", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))

  /** [[encode]] over an [[ArrayData]], returning null (instead of an
    * engine-dependent NPE-or-zero) when any sample element is null. */
  def encodeChecked(samples: ArrayData, sampleRate: Int): Array[Byte] = {
    val n = samples.numElements()
    val arr = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (samples.isNullAt(i)) return null
      arr(i) = samples.getInt(i)
      i += 1
    }
    encode(arr, sampleRate)
  }

  /** Canonical PCM16 mono WAV bytes: RIFF("WAVE") + fmt(16) + data. */
  def encode(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1)                      // audio format: PCM
    bb.putShort(1)                      // channels: mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2)           // byte rate
    bb.putShort(2)                      // block align
    bb.putShort(16)                     // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val s = math.max(-32768, math.min(32767, samples(i)))
      bb.putShort(s.toShort)
      i += 1
    }
    out
  }

  /** Parse + statistics; null when the payload is not PCM16 RIFF/WAVE. */
  def stats(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 44) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(pos: Int): String =
      new String(bytes, pos, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return null
    // chunk walk: fmt must appear before data; unknown chunks skip by
    // declared size (word-aligned, per the RIFF spec)
    var pos = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && dataOff < 0) {
      val id = fourcc(pos)
      val size = bb.getInt(pos + 4)
      // LONG arithmetic: a crafted near-Int.MaxValue chunk size would wrap
      // `pos + 8 + size` negative and slip past an Int bound check — the
      // contract is NULL for poisoned payloads, never a crash
      if (size < 0 || pos.toLong + 8 + size > bytes.length) return null
      id match {
        case "fmt " =>
          if (size < 16) return null
          val fmt = bb.getShort(pos + 8)
          channels = bb.getShort(pos + 10)
          sampleRate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22)
          if (fmt != 1) return null     // PCM only
        case "data" =>
          dataOff = pos + 8; dataLen = size
        case _ =>                       // LIST/INFO/fact/...: skip
      }
      pos += 8 + size + (size & 1)      // word alignment
    }
    if (dataOff < 0 || sampleRate <= 0 || channels <= 0 || bits != 16 ||
        dataLen % (2 * channels) != 0) return null
    val total = dataLen / 2             // samples across channels
    var peak = 0; var clipped = 0; var zc = 0
    var sumSq = 0L
    // zero crossings are a PER-CHANNEL signal property: samples interleave
    // L R L R …, so comparing raw neighbors would count sign flips BETWEEN
    // channels (a constant +L/−R stereo pair would read as all-crossings)
    val prevNeg = new Array[Boolean](channels)
    val started = new Array[Boolean](channels)
    var i = 0
    while (i < total) {
      val s = bb.getShort(dataOff + i * 2).toInt
      val ch = i % channels
      val a = math.abs(s)
      if (a > peak) peak = a
      if (s == 32767 || s == -32768) clipped += 1
      val neg = s < 0
      if (started(ch) && neg != prevNeg(ch)) zc += 1
      prevNeg(ch) = neg; started(ch) = true
      sumSq += s.toLong * s
      i += 1
    }
    InternalRow(sampleRate, channels, total / channels, peak, clipped, zc,
      sumSq)
  }
}
