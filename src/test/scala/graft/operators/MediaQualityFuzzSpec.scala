package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.cv.{AudioOps, ImageOps}

/** Seeded randomized sweeps over the quality-score kernels — the
  * properties the gates CLAIM, checked on random content rather than the
  * graded corpora (the PerceptualHashFuzzSpec convention). Pure-JVM, no
  * Spark session: these exercise the per-item math the UDFs wrap.
  */
class MediaQualityFuzzSpec extends AnyFunSuite {

  private def randImage(rnd: scala.util.Random, rows: Int, cols: Int): ImageOps.DecodedImage = {
    val px = new Array[Byte](rows * cols * 3)
    rnd.nextBytes(px)
    ImageOps.DecodedImage(rows, cols, 3, px)
  }

  test("blur crushes RMS sharpness on random images (the gate's separating claim)") {
    val rnd = new scala.util.Random(61L)
    for (i <- 1 to 30) {
      val rows = 32 + rnd.nextInt(32)
      val cols = 32 + rnd.nextInt(32)
      val img = randImage(rnd, rows, cols)
      val small = ImageOps.resizeBilinear(img.px, rows, cols, 3, 4, 4)
      val blurred = ImageOps.DecodedImage(rows, cols, 3,
        ImageOps.resizeBilinear(small, 4, 4, 3, rows, cols))
      val sharpOrig = MediaQuality.imageLumaStats(img)._3
      val sharpBlur = MediaQuality.imageLumaStats(blurred)._3
      assert(sharpBlur < sharpOrig * 0.5,
        s"iter $i (${rows}x$cols): blur $sharpBlur vs orig $sharpOrig")
    }
  }

  test("entropy is bounded in [0, 4] and zero only for single-bin content") {
    val rnd = new scala.util.Random(67L)
    for (i <- 1 to 30) {
      val img = randImage(rnd, 16 + rnd.nextInt(48), 16 + rnd.nextInt(48))
      val e = MediaQuality.imageLumaStats(img)._4
      assert(e >= 0.0 && e <= 4.0, s"iter $i: entropy $e out of range")
    }
    val flat = ImageOps.DecodedImage(16, 16,
      3, Array.fill[Byte](16 * 16 * 3)(77.toByte))
    assert(MediaQuality.imageLumaStats(flat)._4 == 0.0)
  }

  test("darkening divides mean and contrast together — the verdict-order rationale") {
    val rnd = new scala.util.Random(71L)
    for (i <- 1 to 30) {
      val rows = 24 + rnd.nextInt(40)
      val cols = 24 + rnd.nextInt(40)
      val img = randImage(rnd, rows, cols)
      val dark = ImageOps.DecodedImage(rows, cols, 3,
        img.px.map(b => ((b & 0xff) / 8).toByte))
      val (m, c, s, _) = MediaQuality.imageLumaStats(img)
      val (md, cd, sd, _) = MediaQuality.imageLumaStats(dark)
      // integer floor-division makes the scaling approximate; the claim
      // is only that all three scores shrink together by roughly 8x
      assert(md < m / 4 && cd < c / 4 && sd < s / 4,
        s"iter $i: dark ($md, $cd, $sd) vs orig ($m, $c, $s)")
    }
  }

  test("audio RMS scales linearly with gain below clipping; clipping is gain-monotone") {
    val rnd = new scala.util.Random(73L)
    for (i <- 1 to 30) {
      val n = 4000 + rnd.nextInt(8000)
      val freq = 100.0 + rnd.nextDouble() * 900
      def tone(amp: Double) = AudioOps.DecodedAudio(8000, 1,
        Array.tabulate[Short](n) { j =>
          math.max(-32767.0, math.min(32767.0,
            amp * math.sin(2 * math.Pi * freq * j / 8000))).toShort
        })
      val base = 2000 + rnd.nextInt(6000)
      val r1 = MediaQuality.audioQualityStats(tone(base))._2
      val r2 = MediaQuality.audioQualityStats(tone(base * 2))._2
      assert(math.abs(r2 / r1 - 2.0) < 0.01,
        s"iter $i: rms ratio ${r2 / r1} not ~2 below clipping")
      val cLo = MediaQuality.audioQualityStats(tone(30000))._4
      val cHi = MediaQuality.audioQualityStats(tone(90000))._4
      assert(cHi > cLo, s"iter $i: clipping not monotone in gain ($cLo, $cHi)")
    }
  }

  test("decoders never throw on random or truncated bytes — they return None") {
    val rnd = new scala.util.Random(83L)
    // pure garbage
    for (_ <- 1 to 60) {
      val junk = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(junk)
      ImageOps.decode(junk)
      AudioOps.decodeWav(junk)
      graft.sources.Video.decodeFrames(junk)
    }
    // valid media truncated at every kind of boundary — the realistic
    // corrupt-blob case (a partial upload, a bad object-store read)
    val png = graft.sources.ImageCorpus.render(7L)
    val wav = graft.sources.AudioCorpus.render(7L)
    val gvid = graft.sources.VideoCorpus.render(7L)
    for (_ <- 1 to 40) {
      def cut(b: Array[Byte]) = b.take(1 + rnd.nextInt(b.length - 1))
      ImageOps.decode(cut(png))
      AudioOps.decodeWav(cut(wav))
      graft.sources.Video.decodeFrames(cut(gvid))
    }
    // flipped header magic must be rejected, not crash
    val badWav = wav.clone(); badWav(0) = 'X'.toByte
    assert(AudioOps.decodeWav(badWav).isEmpty)
  }

  test("zeroing a larger suffix monotonically raises the silence ratio") {
    val rnd = new scala.util.Random(79L)
    for (i <- 1 to 20) {
      val n = 8192
      val base = Array.tabulate[Short](n) { j =>
        (6000 * math.sin(2 * math.Pi * 440 * j / 8000)).toShort
      }
      def silenced(frac: Double) = {
        val s = base.clone()
        java.util.Arrays.fill(s, (n * (1 - frac)).toInt, n, 0.toShort)
        MediaQuality.audioQualityStats(AudioOps.DecodedAudio(8000, 1, s))._5
      }
      val fracs = Seq(0.0, 0.25, 0.5, 0.75)
      val ratios = fracs.map(silenced)
      assert(ratios == ratios.sorted,
        s"iter $i: silence ratios not monotone: ${fracs.zip(ratios)}")
      assert(ratios.last > 0.7 && ratios.head == 0.0)
    }
  }
}
