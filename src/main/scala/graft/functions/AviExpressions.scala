package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** `avi_pack(frames, fps, width, height, keyEvery)` — encode an array of raw
  * 8-bit grayscale frames as a REAL RIFF/AVI file: the public AVI 1.0 layout
  * (Microsoft Multimedia Programming Interface spec / OpenDML) with a full
  * `hdrl` header list (`avih` main header, `strl` stream list with a `vids`
  * `strh` and a Y800 `BITMAPINFOHEADER` `strf`), a `movi` list of `00db`
  * uncompressed-frame chunks, and a genuine `idx1` index whose entries carry
  * per-frame offsets and AVIIF_KEYFRAME flags (every `keyEvery`-th frame).
  * Y800 is the standard single-plane 8-bit grayscale FOURCC, so no palette
  * block is needed. The video twin of [[WavEncodePcm16]]: it exists so the
  * index-seeking DECODE lane ([[AviFrameSample]]) can be proven against
  * genuinely-encoded bytes — encode→parse must be the identity on every
  * header field, the frame count (validated three ways) and the sampled
  * frame payloads. Returns NULL when any frame is null or is not exactly
  * width×height bytes, or when fps/width/height/keyEvery are non-positive.
  *
  * Reference anchor: the reference treats payloads as opaque binary columns
  * end-to-end (`src/kafka/execution.rs:135-143` decodes rows without
  * interpreting values); this expression supplies the multimodal
  * interpretation layer above that contract. */
case class AviPack(children: Seq[Expression])
    extends Expression with ImplicitCastInputTypes {

  require(children.length == 5, "avi_pack(frames, fps, width, height, keyEvery)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "avi_pack"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(ArrayType(BinaryType), IntegerType, IntegerType, IntegerType,
      IntegerType)

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    AviCodec.packChecked(vs(0).asInstanceOf[ArrayData],
      vs(1).asInstanceOf[Int], vs(2).asInstanceOf[Int],
      vs(3).asInstanceOf[Int], vs(4).asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val Seq(f, fps, w, h, k) = children.map(_.genCode(ctx))
    ev.copy(code =
      code"""
        ${f.code}
        ${fps.code}
        ${w.code}
        ${h.code}
        ${k.code}
        boolean ${ev.isNull} = true;
        byte[] ${ev.value} = null;
        if (!(${f.isNull} || ${fps.isNull} || ${w.isNull} ||
            ${h.isNull} || ${k.isNull})) {
          ${ev.value} = graft.functions.AviCodec.packChecked(
            ${f.value}, ${fps.value}, ${w.value}, ${h.value}, ${k.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(children = cs)
}

/** `avi_frame_sample(bytes, every)` — parse a RIFF/AVI payload (real chunk
  * walk: `hdrl` list with `avih`/`strh`/`strf` validated for a single Y800
  * `vids` stream, `movi` chunk scan, `idx1` decode) and sample every
  * `every`-th frame THROUGH THE INDEX: each sampled entry's offset is
  * resolved into `movi` (relative-to-movi per the spec, with the well-known
  * absolute-offset writer variant auto-detected, as real players do), the
  * chunk FOURCC and size are verified at the seek target, and only the
  * sampled payloads are touched — the index-seek access pattern that makes
  * frame sampling O(sampled) instead of O(video) on a 100 TB corpus. The
  * frame count is validated three independent ways (avih.dwTotalFrames,
  * the movi scan, the idx1 entry count) and the stream length a fourth;
  * any disagreement, truncation, unknown compression or malformed chunk
  * returns NULL — the QA lane's "undecodable" flag, never a crash.
  *
  * Returned statistics are all EXACT integers:
  *   width, height, usec_per_frame, fps, n_frames,
  *   n_keyframes (idx1 AVIIF_KEYFRAME flags),
  *   sampled_n, sampled_sum (Σ unsigned bytes over sampled frames),
  *   sampled_max (max unsigned byte over sampled frames). */
case class AviFrameSample(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = AviCodec.statsType
  override def nullable: Boolean = true
  override def prettyName: String = "avi_frame_sample"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(BinaryType, IntegerType)

  override def nullSafeEval(bytes: Any, every: Any): Any =
    AviCodec.frameSample(bytes.asInstanceOf[Array[Byte]],
      every.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, e) => s"""
      ${ev.value} = graft.functions.AviCodec.frameSample($b, $e);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object AviCodec {
  val statsType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("usec_per_frame", IntegerType, nullable = false),
    StructField("fps", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_keyframes", IntegerType, nullable = false),
    StructField("sampled_n", IntegerType, nullable = false),
    StructField("sampled_sum", LongType, nullable = false),
    StructField("sampled_max", IntegerType, nullable = false)))

  private val AVIF_HASINDEX = 0x00000010
  private val AVIIF_KEYFRAME = 0x00000010
  /** "Y800" as a little-endian FOURCC int — the public 8-bit grayscale
    * single-plane pixel format (identical byte layout to "GREY"). */
  private val Y800 = fcc("Y800")

  private def fcc(s: String): Int = {
    val b = s.getBytes("US-ASCII")
    (b(0) & 0xFF) | ((b(1) & 0xFF) << 8) | ((b(2) & 0xFF) << 16) |
      ((b(3) & 0xFF) << 24)
  }

  def packChecked(frames: ArrayData, fps: Int, w: Int, h: Int,
      keyEvery: Int): Array[Byte] = {
    // fps > 1e6 would write dwMicroSecPerFrame = 0, which the parser
    // rejects — refuse at encode time so pack→parse stays an identity on
    // every payload pack emits
    if (fps <= 0 || fps > 1000000 || w <= 0 || h <= 0 || keyEvery <= 0)
      return null
    val n = frames.numElements()
    if (n == 0) return null
    val fs = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (frames.isNullAt(i)) return null
      val f = frames.getBinary(i)
      if (f.length != w * h) return null
      fs(i) = f
      i += 1
    }
    pack(fs, fps, w, h, keyEvery)
  }

  /** Canonical AVI 1.0 bytes; frames are raw Y800 (w*h bytes each).
    * Returns null when the container would exceed the 2 GiB RIFF/array
    * bound (LONG size math — a near-overflow stack must hit the NULL
    * contract, never a negative-allocation crash). */
  def pack(frames: Array[Array[Byte]], fps: Int, w: Int, h: Int,
      keyEvery: Int): Array[Byte] = {
    val n = frames.length
    val frameLen = w * h
    val pad = frameLen & 1
    val hdrlData = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviDataL = 4L + n.toLong * (8L + frameLen + pad)
    val idxDataL = n.toLong * 16L
    val riffDataL = 4L + (8L + hdrlData) + (8L + moviDataL) + (8L + idxDataL)
    if (w.toLong * h > Int.MaxValue || 8L + riffDataL > Int.MaxValue)
      return null
    val moviData = moviDataL.toInt
    val idxData = idxDataL.toInt
    val riffData = riffDataL.toInt
    val out = new Array[Byte](8 + riffData)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    tag("RIFF"); bb.putInt(riffData); tag("AVI ")
    // ---- LIST hdrl ----
    tag("LIST"); bb.putInt(hdrlData); tag("hdrl")
    tag("avih"); bb.putInt(56)
    bb.putInt(1000000 / fps)            // dwMicroSecPerFrame
    bb.putInt(0)                        // dwMaxBytesPerSec
    bb.putInt(0)                        // dwPaddingGranularity
    bb.putInt(AVIF_HASINDEX)            // dwFlags
    bb.putInt(n)                        // dwTotalFrames
    bb.putInt(0)                        // dwInitialFrames
    bb.putInt(1)                        // dwStreams
    bb.putInt(frameLen + 8)             // dwSuggestedBufferSize
    bb.putInt(w); bb.putInt(h)          // dwWidth, dwHeight
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    tag("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); tag("strl")
    tag("strh"); bb.putInt(56)
    tag("vids"); tag("Y800")            // fccType, fccHandler
    bb.putInt(0)                        // dwFlags
    bb.putShort(0); bb.putShort(0)      // wPriority, wLanguage
    bb.putInt(0)                        // dwInitialFrames
    bb.putInt(1); bb.putInt(fps)        // dwScale, dwRate → fps
    bb.putInt(0)                        // dwStart
    bb.putInt(n)                        // dwLength (frames)
    bb.putInt(frameLen + 8)             // dwSuggestedBufferSize
    bb.putInt(-1)                       // dwQuality (default)
    bb.putInt(0)                        // dwSampleSize
    bb.putShort(0); bb.putShort(0)      // rcFrame
    bb.putShort(w.toShort); bb.putShort(h.toShort)
    tag("strf"); bb.putInt(40)
    bb.putInt(40)                       // biSize
    bb.putInt(w); bb.putInt(h)          // biWidth, biHeight
    bb.putShort(1); bb.putShort(8)      // biPlanes, biBitCount
    bb.putInt(Y800)                     // biCompression
    bb.putInt(frameLen)                 // biSizeImage
    bb.putInt(0); bb.putInt(0)          // biXPelsPerMeter, biY…
    bb.putInt(0); bb.putInt(0)          // biClrUsed, biClrImportant
    // ---- LIST movi ----
    tag("LIST"); bb.putInt(moviData)
    val moviFccPos = bb.position()
    tag("movi")
    val offs = new Array[Int](n)
    var i = 0
    while (i < n) {
      offs(i) = bb.position() - moviFccPos
      tag("00db"); bb.putInt(frameLen); bb.put(frames(i))
      if (pad == 1) bb.put(0.toByte)
      i += 1
    }
    // ---- idx1 ----
    tag("idx1"); bb.putInt(idxData)
    i = 0
    while (i < n) {
      tag("00db")
      bb.putInt(if (i % keyEvery == 0) AVIIF_KEYFRAME else 0)
      bb.putInt(offs(i)); bb.putInt(frameLen)
      i += 1
    }
    out
  }

  /** Parse + index-driven sample; null when not a valid single-stream Y800
    * AVI or when `every` is non-positive. */
  def frameSample(bytes: Array[Byte], every: Int): InternalRow = {
    if (bytes == null || every <= 0 || bytes.length < 12) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(pos: Int): String = new String(bytes, pos, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return null
    if (8L + bb.getInt(4) > bytes.length) return null

    var usec = -1; var totalFrames = -1; var w = -1; var h = -1
    var scale = -1; var rate = -1; var strLen = -1
    var sawVids = false; var sawStrf = false
    var moviFccPos = -1; var moviEnd = -1; var moviCount = 0
    var idxPos = -1; var idxCount = -1

    // top-level chunk walk (LONG bounds: crafted sizes must not wrap)
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = fourcc(pos)
      val size = bb.getInt(pos + 4)
      if (size < 0 || pos.toLong + 8 + size > bytes.length) return null
      if (id == "LIST" && size >= 4) {
        val ltype = fourcc(pos + 8)
        if (ltype == "hdrl") {
          // nested walk for avih + strl
          var p = pos + 12
          val end = pos + 8 + size
          while (p + 8 <= end) {
            val cid = fourcc(p)
            val csz = bb.getInt(p + 4)
            if (csz < 0 || p.toLong + 8 + csz > end) return null
            if (cid == "avih" && csz >= 40) {
              usec = bb.getInt(p + 8)
              totalFrames = bb.getInt(p + 24)
              w = bb.getInt(p + 40); h = bb.getInt(p + 44)
            } else if (cid == "LIST" && csz >= 4 &&
                fourcc(p + 8) == "strl") {
              var q = p + 12
              val qend = p + 8 + csz
              while (q + 8 <= qend) {
                val sid = fourcc(q)
                val ssz = bb.getInt(q + 4)
                if (ssz < 0 || q.toLong + 8 + ssz > qend) return null
                if (sid == "strh" && ssz >= 48) {
                  if (fourcc(q + 8) == "vids") {
                    sawVids = true
                    scale = bb.getInt(q + 28); rate = bb.getInt(q + 32)
                    strLen = bb.getInt(q + 40)
                  }
                } else if (sid == "strf" && ssz >= 40) {
                  sawStrf = true
                  if (bb.getInt(q + 12) != w || bb.getInt(q + 16) != h ||
                      bb.getShort(q + 22) != 8 ||
                      bb.getInt(q + 24) != Y800) return null
                }
                q += 8 + ssz + (ssz & 1)
              }
            }
            p += 8 + csz + (csz & 1)
          }
        } else if (ltype == "movi") {
          moviFccPos = pos + 8
          moviEnd = pos + 8 + size
          var p = pos + 12
          while (p + 8 <= moviEnd) {
            val cid = fourcc(p)
            val csz = bb.getInt(p + 4)
            if (csz < 0 || p.toLong + 8 + csz > moviEnd) return null
            if (cid == "00db" || cid == "00dc") moviCount += 1
            p += 8 + csz + (csz & 1)
          }
        }
      } else if (id == "idx1") {
        if (size % 16 != 0) return null
        idxPos = pos + 8; idxCount = size / 16
      }
      pos += 8 + size + (size & 1)
    }

    if (usec <= 0 || w <= 0 || h <= 0 || !sawVids || !sawStrf ||
        moviFccPos < 0 || idxPos < 0) return null
    if (scale <= 0 || rate <= 0 || rate % scale != 0) return null
    // frame count must agree FOUR ways: main header, stream header,
    // movi scan, index
    if (totalFrames <= 0 || totalFrames != moviCount ||
        totalFrames != idxCount || totalFrames != strLen) return null
    val frameLen = w * h

    var nKey = 0
    var sampledN = 0; var sampledSum = 0L; var sampledMax = 0
    var i = 0
    while (i < idxCount) {
      val e = idxPos + i * 16
      val ckid = fourcc(e)
      val flags = bb.getInt(e + 4)
      val off = bb.getInt(e + 8)
      val len = bb.getInt(e + 12)
      if ((flags & AVIIF_KEYFRAME) != 0) nKey += 1
      if (i % every == 0) {
        if (len != frameLen || off < 0) return null
        // offsets are relative to the 'movi' FOURCC per the spec; some
        // writers store absolute file offsets — detect like real players:
        // the seek target must hold this entry's chunk header
        var p = moviFccPos + off
        if (p < 0 || p.toLong + 8 + len > bytes.length ||
            fourcc(p) != ckid || bb.getInt(p + 4) != len) {
          p = off
          if (p.toLong + 8 + len > bytes.length || p + 8 > bytes.length ||
              fourcc(p) != ckid || bb.getInt(p + 4) != len) return null
        }
        if (p + 8 + len > moviEnd) return null
        sampledN += 1
        var j = p + 8
        val jEnd = p + 8 + len
        while (j < jEnd) {
          val b = bytes(j) & 0xFF
          sampledSum += b
          if (b > sampledMax) sampledMax = b
          j += 1
        }
      }
      i += 1
    }
    InternalRow(w, h, usec, rate / scale, totalFrames, nKey, sampledN,
      sampledSum, sampledMax)
  }
}
