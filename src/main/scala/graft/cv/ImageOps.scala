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
  def dHash64(img: DecodedImage): Long =
    dHashFromThumb(lumaThumb9x8(img), mirrored = false)

  /** The 9×8 luma thumbnail both dHash variants read. */
  private def lumaThumb9x8(img: DecodedImage): Array[Byte] = {
    val gray = Kernels.grayscale(img.px, img.rows, img.cols, img.channels)
    resizeBilinear(gray, img.rows, img.cols, 1, 8, 9)
  }

  /** dHash bits from a 9×8 thumbnail; `mirrored` reads the columns
    * right-to-left, which equals hashing the horizontally flipped image
    * whenever the resize samples without edge clamping (every downscale —
    * center-aligned sampling keeps source coordinates strictly interior),
    * so the mirror hash costs 64 extra comparisons, not a second
    * grayscale+resize pass.
    */
  private def dHashFromThumb(small: Array[Byte], mirrored: Boolean): Long = {
    var h = 0L
    var bit = 0
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val a = if (mirrored) small(r * 9 + (8 - c)) & 0xff else small(r * 9 + c) & 0xff
        val b = if (mirrored) small(r * 9 + (7 - c)) & 0xff else small(r * 9 + c + 1) & 0xff
        if (a > b) h |= 1L << bit
        bit += 1
        c += 1
      }
      r += 1
    }
    h
  }

  /** 32-point DCT-II basis (orthonormal), row u = the u-th cosine evaluated
    * at the 32 sample centers — precomputed once for [[pHash64]]'s
    * separable transform.
    */
  private val Dct32: Array[Array[Double]] = Array.tabulate(32, 32) { (u, x) =>
    (if (u == 0) math.sqrt(1.0 / 32) else math.sqrt(2.0 / 32)) *
      math.cos((2 * x + 1) * u * math.Pi / 64)
  }

  /** The low-frequency 8×8 block of the 2D DCT-II of the 32×32 grayscale
    * thumbnail — separable (rows then columns), O(32·32·8·2) multiplies,
    * and only the 8×8 corner is ever materialized.
    */
  private def lowFreqDct(img: DecodedImage): Array[Array[Double]] = {
    val gray = Kernels.grayscale(img.px, img.rows, img.cols, img.channels)
    val small = resizeBilinear(gray, img.rows, img.cols, 1, 32, 32)
    // tmp(x)(v) = Σ_y g(x,y)·D(v,y)  (column transform, keep v < 8)
    val tmp = Array.ofDim[Double](32, 8)
    var x = 0
    while (x < 32) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var y = 0
        while (y < 32) { acc += (small(x * 32 + y) & 0xff) * Dct32(v)(y); y += 1 }
        tmp(x)(v) = acc
        v += 1
      }
      x += 1
    }
    // c(u)(v) = Σ_x D(u,x)·tmp(x)(v)  (row transform, keep u < 8)
    val c = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var x2 = 0
        while (x2 < 32) { acc += Dct32(u)(x2) * tmp(x2)(v); x2 += 1 }
        c(u)(v) = acc
        v += 1
      }
      u += 1
    }
    c
  }

  /** 64 bits from an 8×8 DCT block: bit(u,v) = coeff > median of the 64.
    * Median thresholding BALANCES the hash (~32 set bits) — what keeps the
    * Hamming band buckets of [[graft.operators.ImageDedup]] near-uniform
    * (an unbalanced threshold concentrates hashes in few band values and
    * the candidate join degenerates).
    */
  private def hashFromDctBlock(c: Array[Array[Double]]): Long = {
    val flat = new Array[Double](64)
    var i = 0
    while (i < 64) { flat(i) = c(i / 8)(i % 8); i += 1 }
    val sorted = flat.clone()
    java.util.Arrays.sort(sorted)
    val median = (sorted(31) + sorted(32)) / 2.0
    var h = 0L
    i = 0
    while (i < 64) {
      if (flat(i) > median) h |= 1L << i
      i += 1
    }
    h
  }

  /** 64-bit DCT perceptual hash (pHash — the classic pHash.org recipe):
    * grayscale → 32×32 → 2D DCT-II → low-frequency 8×8 block → bits by
    * median threshold. Compared to [[dHash64]] it keys on the image's
    * global low-frequency STRUCTURE rather than local gradient signs, so
    * it survives stronger re-encoding/blur; Hamming distance ≈ structural
    * difference. Pure JVM, map-side only.
    */
  def pHash64(img: DecodedImage): Long = hashFromDctBlock(lowFreqDct(img))

  /** Horizontal flip (column reversal) of an interleaved frame. */
  def hflip(img: DecodedImage): DecodedImage = {
    val out = new Array[Byte](img.px.length)
    var r = 0
    while (r < img.rows) {
      var c = 0
      while (c < img.cols) {
        val src = (r * img.cols + (img.cols - 1 - c)) * img.channels
        val dst = (r * img.cols + c) * img.channels
        var k = 0
        while (k < img.channels) { out(dst + k) = img.px(src + k); k += 1 }
        c += 1
      }
      r += 1
    }
    DecodedImage(img.rows, img.cols, img.channels, out)
  }

  /** MIRROR-CANONICAL dHash: min(dHash(img), dHash(mirror)) — the
    * cheap-hash counterpart of [[pHash64MirrorCanonical]] for callers that
    * hash RAW planes in bulk (video frame voting). ONE grayscale+resize
    * pass: the mirror hash reads the same 9×8 thumbnail right-to-left
    * (see [[dHashFromThumb]] — a full-plane hflip + second pass measured
    * ~2× the whole ext104 map phase for identical bits).
    */
  def dHash64MirrorCanonical(img: DecodedImage): Long = {
    val t = lumaThumb9x8(img)
    math.min(dHashFromThumb(t, mirrored = false), dHashFromThumb(t, mirrored = true))
  }

  /** MIRROR-CANONICAL pHash: min(pHash(img), pHash(hflip(img))) — a
    * horizontally mirrored re-post (the most common image-dedup evasion in
    * scraped corpora) hashes IDENTICALLY to its original, so the banded
    * join catches it like any re-encode. The mirror hash costs no second
    * DCT: flipping columns of a DCT-II input only flips the sign of odd
    * column frequencies (C'(u,v) = (−1)^v·C(u,v)), and for the 64→32
    * bilinear resize flip-then-resize equals resize-then-flip exactly
    * (scale 2, center-aligned sampling never clamps), so the identity is
    * exact end-to-end, not approximate.
    */
  def pHash64MirrorCanonical(img: DecodedImage): Long = {
    val c = lowFreqDct(img)
    val h = hashFromDctBlock(c)
    val m = Array.tabulate(8, 8)((u, v) => if (v % 2 == 1) -c(u)(v) else c(u)(v))
    math.min(h, hashFromDctBlock(m))
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
