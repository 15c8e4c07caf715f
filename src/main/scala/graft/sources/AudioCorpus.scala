package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cv.AudioOps

/** Deterministic synthetic WAV corpus keyed by document id — the audio
  * sibling of [[ImageCorpus]]: no real audio dataset ships offline, so the
  * multimodal entries render one ~1 s PCM-16 WAV per id with KNOWN
  * near-duplicate structure and drive the real binary-column plumbing
  * (encode → binary column → RIFF parse → fingerprint) end to end.
  *
  * Structure mirrors ImageCorpus: families of three (`id / 3`) share an
  * energy envelope (65 amplitude steps from a splitmix-style hash of
  * (family, segment), aligned with [[AudioOps.audioHash64]]'s segment
  * grid) carried on a FAMILY-DEPENDENT tone (300..1323 Hz — inside the
  * spectral bank's range and under every resample target's Nyquist, so
  * the corpus exercises the pitch axis of
  * [[AudioOps.spectralHash64]], not just the envelope); the member index
  * adds that many single-sample clicks — inaudible against segment RMS,
  * so fingerprints agree within a family and are uncorrelated across
  * families. Pure function of the id: identical corpus at every SF.
  */
object AudioCorpus {

  val SampleRate = 8000
  val NSamples = 8190 // 65 segments × 126 samples

  /** One WAV per input id: (doc_id, wav BINARY), rendered map-side. */
  def forIds(ids: DataFrame, idCol: String): DataFrame =
    RenderIds.fanOut(ids, idCol)
      .withColumn("wav", wavFor(col("doc_id")))

  /** WAV bytes column rendered from an arbitrary id expression — lets a
    * caller decouple the CONTENT id from the row's label (ext103 renders
    * divergent audio for a deterministic doc subset this way, so the
    * cross-modal AND gate has pairs to discriminate on). */
  def wavFor(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    renderUdf(id)

  private val renderUdf = udf { id: Long => render(id) }.asNondeterministic()

  /** Deterministic mono PCM-16 WAV for `id`. */
  def render(id: Long): Array[Byte] = {
    val family = id / 3
    val variant = (id % 3).toInt
    val freq = 300.0 + (mix(family, 777L) & 0x3ffL) // 300..1323 Hz per family
    val samples = new Array[Short](NSamples)
    var i = 0
    while (i < NSamples) {
      val seg = (i.toLong * 65 / NSamples).toInt
      val amp = 1000 + (mix(family, seg) & 0x3fffL) // 1000..17383
      samples(i) =
        (amp * math.sin(2 * math.Pi * freq * i / SampleRate)).toShort
      i += 1
    }
    // variant-many single-sample clicks (+50): ~0.1% of a segment's RMS,
    // far below the adjacent-segment energy gaps the fingerprint compares
    var k = 0
    while (k < variant) {
      val pos = ((mix(family, 2000L + k) & 0x7fffffffL) % NSamples).toInt
      samples(pos) =
        math.min(32767, samples(pos) + 50).toShort
      k += 1
    }
    AudioOps.encodeWav(SampleRate, 1, samples)
  }

  /** Window geometry of the CONTAINMENT corpus ([[trackFor]]): 4096
    * samples per window at 8 kHz = 0.512 s — matches
    * [[graft.operators.AudioContainment]]'s default `windowSec`, and
    * leaves 63 samples per spectral sub-segment (65-grid) inside each
    * window. */
  val TrackWindowSamples = 4096
  val TrackWindowSec: Double = TrackWindowSamples.toDouble / SampleRate

  /** One WAV TRACK per input id with KNOWN clip-in-track containment
    * structure — the fixture corpus for [[graft.operators.AudioContainment]]
    * (the family corpus above is built for whole-clip duplicate detection;
    * containment needs variable lengths and an embedded-copy axis):
    *  - id % 4 == 0 → a 4-window CLIP;
    *  - id % 4 == 3 → a 10-window track that EMBEDS clip (id − 3) at
    *    window offset 3, amplitude-scaled by 0.7 (so matching is
    *    perceptual — the embedded bytes differ from the clip's — while
    *    the scale-invariant spectral hash still matches window-for-window);
    *  - otherwise → a fresh 5–8-window track.
    * Every window carries its own tone (300..1323 Hz from the id/window
    * hash) under a 65-step random amplitude envelope, so window hashes are
    * uncorrelated across (id, window) except for the embedded copies.
    * Pure function of the id: identical corpus at every SF.
    */
  def trackFor(ids: DataFrame, idCol: String): DataFrame =
    RenderIds.fanOut(ids, idCol)
      .withColumn("wav", trackUdf(col("doc_id")))

  private val trackUdf = udf { id: Long => renderTrack(id) }.asNondeterministic()

  /** Number of full windows in track `id` (the containment corpus). */
  def trackWindows(id: Long): Int =
    if (id % 4 == 0) 4
    else if (id % 4 == 3) 10
    else 5 + (mix(id, 55L) & 0x3L).toInt

  /** Deterministic mono PCM-16 WAV track for `id` (see [[trackFor]]). */
  def renderTrack(id: Long): Array[Byte] = {
    val nWin = trackWindows(id)
    val samples = new Array[Short](nWin * TrackWindowSamples)
    var w = 0
    while (w < nWin) {
      val embedded = id % 4 == 3 && w >= 3 && w < 7
      val (srcId, srcWin, gain) =
        if (embedded) (id - 3, w - 3, 0.7) else (id, w, 1.0)
      renderWindowInto(srcId, srcWin, gain, samples, w * TrackWindowSamples)
      w += 1
    }
    AudioOps.encodeWav(SampleRate, 1, samples)
  }

  /** One window of track content: a per-(id, window) tone under a 65-step
    * amplitude envelope, written into `out` at `off`. */
  private def renderWindowInto(id: Long, win: Int, gain: Double,
      out: Array[Short], off: Int): Unit = {
    val freq = 300.0 + (mix(id, 9000L + win) & 0x3ffL)
    var i = 0
    while (i < TrackWindowSamples) {
      val seg = (i.toLong * 65 / TrackWindowSamples).toInt
      val amp = 1000 + (mix(id, win.toLong * 1000 + seg) & 0x3fffL)
      out(off + i) =
        (gain * amp * math.sin(2 * math.Pi * freq * i / SampleRate)).toShort
      i += 1
    }
  }

  /** One GRADED WAV per input id — the audio QUALITY-GATE fixture corpus
    * (the family corpus is uniformly healthy tone content; a quality gate
    * needs live failure classes). Grade = id % 5:
    *   - 0 → clean ~1 s tone, amplitude 8000 (keep; RMS ≈ 0.17);
    *   - 1 → near-silent — the same tone at amplitude 100 (RMS ≈ 0.002,
    *     fails the min-RMS rule);
    *   - 2 → clipped — amplitude 60000 saturated into 16-bit range
    *     (~60% of samples pinned at ±32767, fails the clipping rule);
    *   - 3 → mostly silent — tone for the first 40%, digital zero for the
    *     last 60% (silence_ratio ≈ 0.6 fails the silence rule while whole-
    *     track RMS ≈ 0.11 still passes the min-RMS rule — the case that
    *     needs FRAME-level silence, not track RMS);
    *   - 4 → too short — 0.25 s of clean tone (fails the duration rule).
    * Pure function of the id.
    */
  def gradedFor(ids: DataFrame, idCol: String): DataFrame =
    RenderIds.fanOut(ids, idCol)
      .withColumn("wav", gradedUdf(col("doc_id")))

  private val gradedUdf = udf { id: Long => renderGraded(id) }.asNondeterministic()

  /** Deterministic graded WAV for `id` (see [[gradedFor]]). */
  def renderGraded(id: Long): Array[Byte] = {
    val grade = (id % 5).toInt
    val freq = 300.0 + (mix(id, 4242L) & 0x3ffL)
    val n = if (grade == 4) 2000 else NSamples
    val amp = grade match {
      case 1 => 100.0
      case 2 => 60000.0
      case _ => 8000.0
    }
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      val raw = amp * math.sin(2 * math.Pi * freq * i / SampleRate)
      val v = math.max(-32767.0, math.min(32767.0, raw))
      samples(i) =
        if (grade == 3 && i >= (n * 0.4).toInt) 0 else v.toShort
      i += 1
    }
    AudioOps.encodeWav(SampleRate, 1, samples)
  }

  /** One WAV per input id with KNOWN voiced/silence SEGMENT structure —
    * the fixture corpus for [[graft.operators.AudioSegmentation]] (the
    * family/track corpora have no silence axis): 1–4 voiced tone spans of
    * 8–15 frames on the 512-sample segmentation grid, separated by
    * silence gaps of 3–6 frames (wider than the segmenter's tolerated
    * dropout), with a 0–3-frame leading gap and a 2-frame tail. Every
    * span boundary is frame-aligned, so the expected segmentation
    * ([[segmentSpans]]) is exact. Pure function of the id.
    */
  def segmentedFor(ids: DataFrame, idCol: String): DataFrame =
    RenderIds.fanOut(ids, idCol)
      .withColumn("wav", segmentedUdf(col("doc_id")))

  private val segmentedUdf = udf { id: Long => renderSegmented(id) }.asNondeterministic()

  /** The voiced spans of track `id` as (start_frame, n_frames) on the
    * 512-sample grid. */
  def segmentSpans(id: Long): Seq[(Int, Int)] = {
    val k = 1 + (mix(id, 31L) & 0x3L).toInt
    var pos = (mix(id, 37L) & 0x3L).toInt
    (0 until k).map { s =>
      val len = 8 + (mix(id, 300L + s) & 0x7L).toInt
      val start = pos
      pos = start + len + 3 + (mix(id, 400L + s) & 0x3L).toInt
      (start, len)
    }
  }

  /** Deterministic segmented WAV for `id` (see [[segmentedFor]]). */
  def renderSegmented(id: Long): Array[Byte] = {
    val spans = segmentSpans(id)
    val frame = graft.operators.AudioSegmentation.FrameSamples
    val total = spans.last._1 + spans.last._2 + 2
    val samples = new Array[Short](total * frame)
    spans.zipWithIndex.foreach { case ((start, len), s) =>
      val freq = 300.0 + (mix(id, 500L + s) & 0x3ffL)
      var i = 0
      while (i < len * frame) {
        samples(start * frame + i) =
          (8000 * math.sin(2 * math.Pi * freq * i / SampleRate)).toShort
        i += 1
      }
    }
    AudioOps.encodeWav(SampleRate, 1, samples)
  }

  /** splitmix64-style stateless mix — same public-domain constant schedule
    * as [[ImageCorpus]]. */
  private def mix(a: Long, b: Long): Long = {
    var z = a * 0x9e3779b97f4a7c15L + b
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
