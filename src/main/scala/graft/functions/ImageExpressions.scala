package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `avg_hash64(imageBytes)` — the classic average-hash (aHash) perceptual
  * image fingerprint, DCT-free: decode the payload, block-average the
  * luminance down to an 8×8 grid (64 cells), then set bit i when cell i is
  * brighter than the grid mean. Two perceptually-near images differ in few
  * bits, so near-duplicate detection is a small-Hamming-distance search —
  * which the simhash banding infrastructure already solves at scale.
  *
  * The decode step is REAL for the formats the JDK ships codecs for
  * (PNG/JPEG/BMP/GIF via `javax.imageio` — no external jars): payloads
  * whose magic bytes match are decoded to pixels and the 8×8 grid averages
  * true luminance (BT.601 weights), so two different ENCODINGS of the same
  * pixels (a PNG re-encode, a BMP round-trip) hash identically and a lossy
  * JPEG re-encode lands within a few bits. Non-image payloads (and formats
  * without a JDK codec) take the raw-bytes lane: the same 8×8 block
  * average over the payload bytes — a deterministic fingerprint that keeps
  * banding/Hamming semantics for opaque blobs. The magic-byte sniff keeps
  * the non-image hot path free of codec probing.
  *
  * Codegen via a static helper; one pass over the payload per row. */
case class AvgHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "avg_hash64"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(BinaryType)

  override def nullSafeEval(v: Any): Any =
    AvgHash64.hash(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AvgHash64.hash($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object AvgHash64 {
  // per-row decodes must never touch a disk-backed ImageIO cache file
  javax.imageio.ImageIO.setUseCache(false)

  /** Static body shared by eval and generated code. */
  def hash(bytes: Array[Byte]): Long = {
    if (looksLikeImage(bytes)) {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      // null = sniffed like an image but no codec / corrupt stream: fall
      // back to the raw lane rather than fail the row — the fingerprint
      // stays deterministic either way
      if (img != null) return imageHash(img)
    }
    rawHash(bytes)
  }

  /** JDK-decodable magics only: PNG, JPEG, BMP, GIF. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) ||
      (b(0) == 'B' && b(1) == 'M') ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'))

  /** True aHash over decoded pixels: 8×8 block mean of BT.601 luminance. */
  private def imageHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return 0L
    // one bulk RGB grab (payloads are bounded multimodal blobs); avoids a
    // per-pixel getRGB call through the color model
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val cells = new Array[Double](64)
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8
      var y1 = (cy + 1) * h / 8
      if (y1 <= y0) y1 = math.min(h, y0 + 1)
      var cx = 0
      while (cx < 8) {
        val x0 = cx * w / 8
        var x1 = (cx + 1) * w / 8
        if (x1 <= x0) x1 = math.min(w, x0 + 1)
        var s = 0.0
        var y = y0
        while (y < y1) {
          val row = y * w
          var x = x0
          while (x < x1) {
            val rgb = px(row + x)
            s += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        cells(cy * 8 + cx) = s / ((y1 - y0).toLong * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    threshold(cells)
  }

  /** Raw-bytes lane for opaque payloads: 8×8 "resize" over the byte run. */
  private def rawHash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val cells = new Array[Double](64)
    var i = 0
    while (i < 64) {
      // block boundaries in 64ths of the payload — the 8×8 "resize"
      val lo = (i.toLong * n / 64).toInt
      var hi = ((i + 1).toLong * n / 64).toInt
      if (hi <= lo) hi = math.min(n, lo + 1)
      var s = 0L
      var j = lo
      while (j < hi) { s += (bytes(j) & 0xff); j += 1 }
      cells(i) = s.toDouble / (hi - lo)
      i += 1
    }
    threshold(cells)
  }

  private def threshold(cells: Array[Double]): Long = {
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += cells(i); i += 1 }
    mean /= 64.0
    var h = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }
}
