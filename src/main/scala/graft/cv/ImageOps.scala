package graft.cv

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

/** Pure-JVM image codecs/transforms for multimodal binary columns.
  * PNG decode is REAL (javax.imageio ships with the JDK — lossless, so
  * pipeline PNGs round-trip exactly); JPEG/video decode would slot in the
  * same signatures where native codecs exist.
  */
object ImageOps {

  /** Decoded image: interleaved BGR bytes + geometry (matches the frame
    * layout of [[Kernels]]).
    */
  final case class DecodedImage(rows: Int, cols: Int, channels: Int, px: Array[Byte])

  /** PNG/BMP/GIF bytes → interleaved BGR, or None if undecodable. */
  def decode(bytes: Array[Byte]): Option[DecodedImage] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val rows = img.getHeight
        val cols = img.getWidth
        val px = new Array[Byte](rows * cols * 3)
        var r = 0
        while (r < rows) {
          var c = 0
          while (c < cols) {
            val rgb = img.getRGB(c, r)
            val o = (r * cols + c) * 3
            px(o) = (rgb & 0xff).toByte // B
            px(o + 1) = ((rgb >> 8) & 0xff).toByte // G
            px(o + 2) = ((rgb >> 16) & 0xff).toByte // R
            c += 1
          }
          r += 1
        }
        Some(DecodedImage(rows, cols, 3, px))
      }
    } catch { case _: Exception => None }

  /** Bilinear resize of an interleaved image (the producer's
    * `resize(…, 640×480, INTER_CUBIC)` analog,
    * /root/reference/dvaf/producer/.../VideoEventCreator.java:75 — bilinear
    * here; cubic differs only in interpolation weights).
    */
  def resizeBilinear(
      px: Array[Byte], rows: Int, cols: Int, channels: Int,
      outRows: Int, outCols: Int): Array[Byte] = {
    val out = new Array[Byte](outRows * outCols * channels)
    val rScale = rows.toDouble / outRows
    val cScale = cols.toDouble / outCols
    var r = 0
    while (r < outRows) {
      val sr = math.min((r + 0.5) * rScale - 0.5, rows - 1.0).max(0.0)
      val r0 = sr.toInt
      val r1 = math.min(r0 + 1, rows - 1)
      val fr = sr - r0
      var c = 0
      while (c < outCols) {
        val sc = math.min((c + 0.5) * cScale - 0.5, cols - 1.0).max(0.0)
        val c0 = sc.toInt
        val c1 = math.min(c0 + 1, cols - 1)
        val fc = sc - c0
        var k = 0
        while (k < channels) {
          val v00 = px((r0 * cols + c0) * channels + k) & 0xff
          val v01 = px((r0 * cols + c1) * channels + k) & 0xff
          val v10 = px((r1 * cols + c0) * channels + k) & 0xff
          val v11 = px((r1 * cols + c1) * channels + k) & 0xff
          val v = (v00 * (1 - fr) * (1 - fc) + v01 * (1 - fr) * fc +
            v10 * fr * (1 - fc) + v11 * fr * fc + 0.5).toInt
          out((r * outCols + c) * channels + k) = math.min(255, math.max(0, v)).toByte
          k += 1
        }
        c += 1
      }
      r += 1
    }
    out
  }

  /** 64-bit difference hash (dHash, the standard perceptual image
    * fingerprint): grayscale → bilinear resize to 9×8 → one bit per
    * horizontally-adjacent luma pair (left > right). Robust to re-encoding,
    * small noise and resizing; Hamming distance between hashes ≈ visual
    * difference. Pure JVM, O(pixels) per image, map-side only.
    */
  def dHash64(img: DecodedImage): Long = {
    val gray = Kernels.grayscale(img.px, img.rows, img.cols, img.channels)
    val small = resizeBilinear(gray, img.rows, img.cols, 1, 8, 9)
    var h = 0L
    var bit = 0
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if ((small(r * 9 + c) & 0xff) > (small(r * 9 + c + 1) & 0xff))
          h |= 1L << bit
        bit += 1
        c += 1
      }
      r += 1
    }
    h
  }

  /** Cheap content features for a decoded frame: mean luma, luma stddev, and
    * edge density (fraction of pixels whose horizontal gradient exceeds 32) —
    * the shape of a feature-extraction stage in a training-data pipeline.
    */
  def features(px: Array[Byte], rows: Int, cols: Int, channels: Int): (Double, Double, Double) = {
    val gray = Kernels.grayscale(px, rows, cols, channels)
    val n = rows * cols
    var sum = 0.0
    var sumSq = 0.0
    var i = 0
    while (i < n) {
      val v = gray(i) & 0xff
      sum += v; sumSq += v.toDouble * v
      i += 1
    }
    val mean = sum / n
    val std = math.sqrt(math.max(0, sumSq / n - mean * mean))
    var edges = 0L
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols - 1) {
        val d = math.abs((gray(r * cols + c) & 0xff) - (gray(r * cols + c + 1) & 0xff))
        if (d > 32) edges += 1
        c += 1
      }
      r += 1
    }
    // a 1-px-wide image has no horizontal pairs: density 0, never NaN
    val nPairs = rows.toLong * math.max(1, cols - 1)
    (mean, std, edges.toDouble / nPairs)
  }
}
