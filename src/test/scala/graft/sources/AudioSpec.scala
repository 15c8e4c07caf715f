package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.cv.AudioOps

class AudioSpec extends AnyFunSuite with SparkTestSession {

  private def sine(rate: Int, hz: Double, seconds: Double): Array[Short] =
    Array.tabulate((rate * seconds).toInt)(i =>
      (math.sin(2 * math.Pi * hz * i / rate) * 16384).toShort)

  test("WAV encode/decode round-trips samples exactly") {
    val s = sine(8000, 440, 0.1)
    val decoded = AudioOps.decodeWav(AudioOps.encodeWav(8000, 1, s)).get
    assert(decoded.sampleRate == 8000 && decoded.channels == 1)
    assert(decoded.samples.toSeq == s.toSeq)
  }

  test("features: silence is zero; a sine has rms ≈ peak/√2 and 2·hz/rate crossings") {
    val silent = AudioOps.DecodedAudio(8000, 1, Array.fill(800)(0: Short))
    assert(AudioOps.features(silent) == ((0.0, 0.0, 0.0)))
    val s = AudioOps.decodeWav(AudioOps.encodeWav(8000, 1, sine(8000, 440, 0.5))).get
    val (rms, peak, zcr) = AudioOps.features(s)
    assert(math.abs(peak - 0.5) < 0.01)
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01)
    assert(math.abs(zcr - 2.0 * 440 / 8000) < 0.01)
  }

  test("odd-sized ancillary chunks are skipped with their RIFF pad byte") {
    val s = sine(8000, 440, 0.05)
    val plain = AudioOps.encodeWav(8000, 1, s)
    // splice an odd-sized LIST chunk (5 bytes + 1 pad) between fmt and data
    val fmtEnd = 12 + 8 + 16
    val chunk = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = plain.take(fmtEnd) ++ chunk ++ plain.drop(fmtEnd)
    val decoded = AudioOps.decodeWav(spliced)
    assert(decoded.isDefined)
    assert(decoded.get.samples.toSeq == s.toSeq)
  }

  test("a forged multi-GB data-chunk size is rejected without allocating") {
    val wav = AudioOps.encodeWav(8000, 1, sine(8000, 440, 0.01))
    // data chunk size field sits 8 bytes before the samples (offset 40)
    val bb = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, 0x7FFFFFF0)
    assert(AudioOps.decodeWav(wav).isEmpty)
  }

  test("stereo ZCR compares within channels, not across interleaved samples") {
    // L constant +1000, R constant -1000: neither channel ever crosses zero.
    // An interleaved comparison would see a sign flip at EVERY sample.
    val interleaved = Array.tabulate[Short](400)(i => if (i % 2 == 0) 1000 else -1000)
    val (_, _, zcr) = AudioOps.features(AudioOps.DecodedAudio(8000, 2, interleaved))
    assert(zcr == 0.0)
    // and a stereo signal whose channels DO cross still counts per channel
    val bothSines = Array.tabulate[Short](800) { i =>
      (math.sin(2 * math.Pi * 440 * (i / 2) / 8000) * 16384).toShort
    }
    val (_, _, zcr2) = AudioOps.features(AudioOps.DecodedAudio(8000, 2, bothSines))
    assert(math.abs(zcr2 - 2.0 * 440 / 8000) < 0.02)
  }

  test("resample of empty audio returns empty instead of crashing") {
    val out = AudioOps.resample(AudioOps.DecodedAudio(8000, 1, Array.empty), 16000)
    assert(out.sampleRate == 16000 && out.samples.isEmpty)
  }

  test("a forged fmt size < 16 is rejected before the fixed fields are read") {
    val wav = AudioOps.encodeWav(8000, 1, sine(8000, 440, 0.01))
    val bb = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // fmt chunk size field sits at offset 16; 12 < 16 would rewind the
    // cursor into the already-parsed fmt body and misparse what follows
    bb.putInt(16, 12)
    assert(AudioOps.decodeWav(wav).isEmpty)
  }

  test("a negative unknown-chunk size is rejected instead of looping forever") {
    val wav = AudioOps.encodeWav(8000, 1, sine(8000, 440, 0.01))
    val fmtEnd = 12 + 8 + 16
    // unknown chunk declaring size -8 would rewind the cursor to its own start
    val evil = Array[Byte]('J', 'U', 'N', 'K', -8, -1, -1, -1)
    val spliced = wav.take(fmtEnd) ++ evil ++ wav.drop(fmtEnd)
    assert(AudioOps.decodeWav(spliced).isEmpty)
  }

  test("zero-channel WAVs are rejected, not crash material") {
    val s = sine(8000, 440, 0.05)
    val wav = AudioOps.encodeWav(8000, 1, s)
    wav(22) = 0 // fmt channels field → 0
    assert(AudioOps.decodeWav(wav).isEmpty)
  }

  test("resample halves the frame count at half rate") {
    val s = AudioOps.DecodedAudio(8000, 1, sine(8000, 100, 0.2))
    val r = AudioOps.resample(s, 4000)
    assert(r.sampleRate == 4000 && r.samples.length == s.samples.length / 2)
  }

  test("binaryFile read + decode + features over a wav directory") {
    val dir = graft.ScratchDir.dir("wavs")
    Files.write(Paths.get(dir, "tone.wav"), AudioOps.encodeWav(8000, 1, sine(8000, 440, 0.2)))
    Files.write(Paths.get(dir, "quiet.wav"), AudioOps.encodeWav(16000, 1, Array.fill(1600)(0: Short)))
    Files.write(Paths.get(dir, "junk.wav"), Array[Byte](9, 9, 9))

    val meta = Audio.decoded(Audio.readWavDir(spark, dir)).collect()
      .map(r => (r.getAs[String]("path").split('/').last,
        r.getAs[Int]("sample_rate"), r.getAs[Int]("n_samples"))).sorted.toSeq
    assert(meta == Seq(("quiet.wav", 16000, 1600), ("tone.wav", 8000, 1600)))

    val feats = Audio.withFeatures(Audio.readWavDir(spark, dir)).collect()
      .map(r => r.getAs[String]("path").split('/').last -> r.getAs[Double]("rms")).toMap
    assert(feats("quiet.wav") == 0.0)
    assert(feats("tone.wav") > 0.3)
  }
}
