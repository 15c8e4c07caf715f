package graft.cv

import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO

/** PNG side-output, replacing the reference's Imgcodecs.imwrite
  * (/root/reference/dvaf/processor/.../MotionDetector.java:133-177).
  * Deterministic filenames ({camId}-T-{epochMillis}.png, :147) make replays
  * under at-least-once delivery idempotent — same rationale as the
  * reference.
  */
object Png {

  /** Interleaved BGR (or gray) bytes → BufferedImage. */
  def toImage(px: Array[Byte], rows: Int, cols: Int, channels: Int): BufferedImage = {
    val img = new BufferedImage(cols, rows, BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) {
        val o = (r * cols + c) * channels
        val rgb = if (channels >= 3) {
          val b = px(o) & 0xff; val g = px(o + 1) & 0xff; val rr = px(o + 2) & 0xff
          (rr << 16) | (g << 8) | b
        } else {
          val v = px(o) & 0xff
          (v << 16) | (v << 8) | v
        }
        img.setRGB(c, r, rgb)
        c += 1
      }
      r += 1
    }
    img
  }

  /** Interleaved bytes → encoded PNG bytes (the binary-column form a
    * multimodal pipeline carries through parquet / binaryFile sources).
    * Lossless, so decode(encodeBytes(px)) round-trips the pixels exactly.
    */
  def encodeBytes(px: Array[Byte], rows: Int, cols: Int, channels: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(toImage(px, rows, cols, channels), "png", bos)
    bos.toByteArray
  }

  /** camId comes off the untrusted wire; keep it a flat filename component
    * (no separators / traversal) before it reaches the filesystem.
    */
  def sanitizeCamId(camId: String): String = {
    val s = Option(camId).getOrElse("null").replaceAll("[^A-Za-z0-9._-]", "_")
    if (s.isEmpty || s.forall(_ == '.')) "_" else s
  }

  /** Write `{camId}-T-{epochMillis}.png` under outputDir (mkdir -p). */
  def saveFrame(
      px: Array[Byte], rows: Int, cols: Int, channels: Int,
      camId: String, epochMillis: Long, outputDir: String): String = {
    val dir = new File(outputDir)
    if (!dir.exists()) dir.mkdirs()
    val path = new File(dir, s"${sanitizeCamId(camId)}-T-$epochMillis.png")
    ImageIO.write(toImage(px, rows, cols, channels), "png", path)
    path.getAbsolutePath
  }
}
