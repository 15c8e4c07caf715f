package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cv.Png

/** Deterministic synthetic PNG corpus keyed by document id — the offline
  * stand-in for the engine's own image side-outputs (the A10 PNG sink):
  * the container has no real image dataset, so the multimodal entries
  * render one 64×64 PNG per id with KNOWN near-duplicate structure and
  * run the real binary-column plumbing (encode → binary column → decode →
  * perceptual hash) end to end.
  *
  * Structure: ids form families of three (`id / 3`); every member of a
  * family renders the same 8×8-block noise pattern (splitmix-style hash of
  * (family, block)), and the member index (`id % 3`) perturbs that many
  * single pixels by a small delta — visually identical within a family
  * (dHash Hamming ≈ 0), uncorrelated across families (Hamming ≈ 32).
  * Everything is a pure function of the id: re-running any SF yields the
  * identical corpus, so the dedup entries are deterministic without
  * shipping image fixtures.
  */
object ImageCorpus {

  val Side = 64
  private val Block = 8

  /** One PNG per input id: (doc_id, png BINARY). The render runs
    * map-side (a UDF over the id column) — at corpus scale this is the
    * same shape as decoding real blobs off a binaryFile/parquet scan.
    */
  def forIds(ids: DataFrame, idCol: String): DataFrame =
    RenderIds.fanOut(ids, idCol)
      .withColumn("png", renderUdf(col("doc_id")))

  private val renderUdf = udf { id: Long => render(id) }.asNondeterministic()

  /** Deterministic 64×64 grayscale-as-BGR PNG for `id`. */
  def render(id: Long): Array[Byte] = {
    val family = id / 3
    val variant = (id % 3).toInt
    val px = new Array[Byte](Side * Side * 3)
    var r = 0
    while (r < Side) {
      var c = 0
      while (c < Side) {
        val v = (mix(family, (r / Block).toLong * 31 + (c / Block)) & 0xffL).toInt
        val o = (r * Side + c) * 3
        px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
        c += 1
      }
      r += 1
    }
    // variant-many single-pixel bumps (+6 luma): far below the 8×8 block
    // mean resolution dHash sees, so family members stay near-identical
    var k = 0
    while (k < variant) {
      val pos = ((mix(family, 1000L + k) & 0x7fffffffL) % (Side * Side)).toInt
      val o = pos * 3
      val bumped = math.min(255, (px(o) & 0xff) + 6)
      px(o) = bumped.toByte; px(o + 1) = bumped.toByte; px(o + 2) = bumped.toByte
      k += 1
    }
    Png.encodeBytes(px, Side, Side, 3)
  }

  /** One GRADED PNG per input id — the QUALITY-GATE fixture corpus: the
    * family corpus above is uniformly clean block noise (right for dedup,
    * where only identity structure matters; useless for a quality gate,
    * which needs live failure classes). Grade = id % 5:
    *   - 0 → clean 64×64 block noise (keep);
    *   - 1 → near-uniform flat gray (fails the contrast rule);
    *   - 2 → blurred — the clean pattern point-sampled down to 4×4 and
    *     bilinearly re-expanded, turning block edges into 16-px ramps
    *     (fails the RMS-gradient sharpness rule while KEEPING healthy
    *     contrast — the discriminating case for RMS-vs-total-variation);
    *   - 3 → dark — the clean pattern at 1/8 luma (fails the mean-luma
    *     rule; its contrast/sharpness also shrink 8×, which is why the
    *     verdict order checks darkness first);
    *   - 4 → tiny 16×16 (fails the min-side rule).
    * Pure function of the id; per-id patterns (no family structure —
    * quality is a per-item property).
    */
  def gradedFor(ids: DataFrame, idCol: String): DataFrame =
    RenderIds.fanOut(ids, idCol)
      .withColumn("png", gradedUdf(col("doc_id")))

  private val gradedUdf = udf { id: Long => renderGraded(id) }.asNondeterministic()

  /** Deterministic graded PNG for `id` (see [[gradedFor]]). */
  def renderGraded(id: Long): Array[Byte] = renderGrade(id, (id % 5).toInt)

  /** The PNG of `id` rendered at an EXPLICIT grade (0 clean / 1 flat /
    * 2 blurred / 3 dark / 4 tiny) — [[gradedFor]] keys the grade off the
    * id; the funnel corpus ([[funnelFor]]) keys it off the FAMILY so whole
    * families share a quality fate and the dedup stage downstream of the
    * quality gate stays live.
    */
  def renderGrade(id: Long, grade: Int): Array[Byte] = {
    def noise(side: Int, block: Int, dim: Int): Array[Byte] = {
      val px = new Array[Byte](side * side * 3)
      var r = 0
      while (r < side) {
        var c = 0
        while (c < side) {
          val v = ((mix(id * 31 + 7, (r / block).toLong * 131 + (c / block))
            & 0xffL).toInt) / dim
          val o = (r * side + c) * 3
          px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
          c += 1
        }
        r += 1
      }
      px
    }
    grade match {
      case 0 => Png.encodeBytes(noise(Side, Block, 1), Side, Side, 3)
      case 1 =>
        val px = new Array[Byte](Side * Side * 3)
        java.util.Arrays.fill(px, 128.toByte)
        // one off-gray pixel so the PNG isn't a degenerate single color
        px(0) = 129.toByte; px(1) = 129.toByte; px(2) = 129.toByte
        Png.encodeBytes(px, Side, Side, 3)
      case 2 =>
        val small = graft.cv.ImageOps.resizeBilinear(
          noise(Side, Block, 1), Side, Side, 3, 4, 4)
        val blurred = graft.cv.ImageOps.resizeBilinear(
          small, 4, 4, 3, Side, Side)
        Png.encodeBytes(blurred, Side, Side, 3)
      case 3 => Png.encodeBytes(noise(Side, Block, 8), Side, Side, 3)
      case _ => Png.encodeBytes(noise(16, 4, 1), 16, 16, 3)
    }
  }

  /** The image CURATION-FUNNEL corpus — every stage of an image funnel
    * (decode gate → quality gate → perceptual dedup → eval
    * decontamination) live in one corpus, which neither the family corpus
    * (all clean: quality never fires) nor the graded corpus (per-id
    * grades: a clean image's family siblings fail quality, so dedup never
    * fires downstream of the gate) can provide:
    *  - id % 41 == 11 → CORRUPT bytes (undecodable — the decode gate);
    *  - else, quality fate is keyed off the FAMILY (`(id/3) % 4`):
    *    0 → the standard family corpus image [[render]] (whole clean
    *    families → the dedup stage drops siblings), 1 → flat, 2 →
    *    blurred, 3 → dark ([[renderGrade]] per member — the quality
    *    gate drops whole families).
    * Clean images are bit-identical to the standard corpus's, so the
    * session's MEMOIZED standard fingerprint table doubles as the eval
    * benchmark for the decontamination stage (ids ≡ 3 mod 7, the ext116
    * singles split): a surviving family leaks iff it contains a benchmark
    * id. Pure function of the id.
    */
  def funnelFor(ids: DataFrame, idCol: String): DataFrame =
    RenderIds.fanOut(ids, idCol)
      .withColumn("png", funnelUdf(col("doc_id")))

  private val funnelUdf = udf { id: Long => renderFunnel(id) }.asNondeterministic()

  /** Deterministic funnel-corpus PNG for `id` (see [[funnelFor]]);
    * corrupt ids return bytes that fail to decode. */
  def renderFunnel(id: Long): Array[Byte] =
    if (id % 41 == 11) Array[Byte](0x42, 0x4f, 0x47, 0x55, 0x53)
    else ((id / 3) % 4).toInt match {
      case 0 => render(id)
      case g => renderGrade(id, g)
    }

  /** splitmix64-style stateless mix of (a, b) — public-domain constant
    * schedule (Steele et al., "Fast splittable pseudorandom number
    * generators", OOPSLA 2014). */
  private def mix(a: Long, b: Long): Long = {
    var z = a * 0x9e3779b97f4a7c15L + b
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
