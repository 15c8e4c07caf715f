package graft.cv

import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized sweeps over the r9 perceptual fingerprints — the
  * properties each hash CLAIMS, checked on random content rather than the
  * aligned synthetic corpora (deterministic seeds, the DedupFuzzSpec
  * convention): mirror canonicalization must be an exact invariant on
  * arbitrary even-width images, median thresholding must balance bits on
  * arbitrary content, and the spectral hash's amplitude invariance must
  * hold for arbitrary PCM, not just the corpus's tone families.
  */
class PerceptualHashFuzzSpec extends AnyFunSuite {

  private def randImage(rnd: scala.util.Random, rows: Int, cols: Int): ImageOps.DecodedImage = {
    val px = new Array[Byte](rows * cols * 3)
    rnd.nextBytes(px)
    ImageOps.DecodedImage(rows, cols, 3, px)
  }

  test("pHash mirror canonicalization is exact on random even-width images") {
    val rnd = new scala.util.Random(41L)
    for (i <- 1 to 40) {
      val rows = 16 + rnd.nextInt(48)
      val cols = 2 * (8 + rnd.nextInt(24)) // even width: flip/resize commute
      val img = randImage(rnd, rows, cols)
      val a = ImageOps.pHash64MirrorCanonical(img)
      val b = ImageOps.pHash64MirrorCanonical(ImageOps.hflip(img))
      assert(a == b, s"iter $i (${rows}x$cols): canonical hash differs under hflip")
    }
  }

  test("pHash bits stay balanced on random content (band-bucket health)") {
    val rnd = new scala.util.Random(43L)
    for (i <- 1 to 40) {
      val img = randImage(rnd, 32 + rnd.nextInt(32), 32 + rnd.nextInt(32))
      val bits = java.lang.Long.bitCount(ImageOps.pHash64(img))
      assert(math.abs(bits - 32) <= 4, s"iter $i: $bits set bits — median threshold broken")
    }
  }

  test("mirror-canonical dHash matches the full-plane flip on random downscaled images") {
    // the thumbnail right-to-left read must equal hashing the flipped plane
    // (exact for every downscale — no resize clamping)
    val rnd = new scala.util.Random(47L)
    for (i <- 1 to 40) {
      val img = randImage(rnd, 12 + rnd.nextInt(52), 12 + rnd.nextInt(52))
      val viaThumb = ImageOps.dHash64MirrorCanonical(img)
      val viaFlip = math.min(ImageOps.dHash64(img), ImageOps.dHash64(ImageOps.hflip(img)))
      assert(viaThumb == viaFlip, s"iter $i: thumbnail mirror != full-plane flip")
    }
  }

  test("spectral hash is amplitude-invariant on random PCM") {
    val rnd = new scala.util.Random(53L)
    for (i <- 1 to 25) {
      val n = 2000 + rnd.nextInt(8000)
      val samples = Array.fill(n)((rnd.nextInt(20000) - 10000).toShort)
      val a = AudioOps.DecodedAudio(8000, 1, samples)
      val h0 = AudioOps.spectralHash64(a)
      // scale by 1/3: ln turns it into a constant shift, centroid is a ratio
      val scaled = a.copy(samples = samples.map(s => (s / 3).toShort))
      val d = java.lang.Long.bitCount(h0 ^ AudioOps.spectralHash64(scaled))
      // requantization of random (non-tonal) content can graze a couple of
      // borderline comparisons; far under the dedup threshold is the claim
      assert(d <= 2, s"iter $i: amplitude scaling moved the spectral hash by $d bits")
    }
  }

  test("spectral hash separates same-envelope different-pitch on random envelopes") {
    val rnd = new scala.util.Random(59L)
    for (i <- 1 to 10) {
      val n = AudioCorpusLikeN
      val amps = Array.fill(66)(500 + rnd.nextInt(15000))
      def render(freqOf: Int => Double): AudioOps.DecodedAudio = {
        val s = new Array[Short](n)
        var k = 0
        while (k < n) {
          val seg = (k.toLong * 65 / n).toInt
          s(k) = (amps(seg) * math.sin(2 * math.Pi * freqOf(seg) * k / 8000.0)).toShort
          k += 1
        }
        AudioOps.DecodedAudio(8000, 1, s)
      }
      val flat = AudioOps.spectralHash64(render(_ => 440.0))
      val warble = AudioOps.spectralHash64(
        render(seg => if (seg % 2 == 0) 280.0 else 1150.0))
      val d = java.lang.Long.bitCount(flat ^ warble)
      assert(d > 10, s"iter $i: pitch warble only moved the hash by $d bits")
    }
  }

  private val AudioCorpusLikeN = 8190
}
