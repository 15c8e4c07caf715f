package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic synthetic GVID corpus keyed by document id — the video
  * sibling of [[ImageCorpus]]/[[AudioCorpus]]: families of three (`id / 3`)
  * share a 12-frame 32×32 block-noise sequence (every frame's pattern is a
  * splitmix-style hash of (family, frame, block)); the member index
  * perturbs that many single pixels PER FRAME — below dHash resolution, so
  * family members' frame hashes agree while families are uncorrelated.
  * Pure function of the id.
  */
object VideoCorpus {

  val Side = 32
  val NFrames = 12
  // 4-px blocks → an 8×8 block grid, aligned with dHash's 9×8 sample grid:
  // every adjacent-sample comparison crosses a block boundary, so the full
  // 64 bits carry entropy (8-px blocks on a 32-px frame leave most bits
  // structurally zero — hash slices then collapse into giant band buckets
  // and the candidate join degenerates toward all-pairs)
  private val Block = 4

  /** One GVID per input id: (doc_id, gvid BINARY), rendered map-side. */
  def forIds(ids: DataFrame, idCol: String): DataFrame =
    RenderIds.fanOut(ids, idCol)
      .withColumn("gvid", renderUdf(col("doc_id")))

  private val renderUdf = udf { id: Long => render(id) }.asNondeterministic()

  /** Deterministic 12-frame 32×32 BGR GVID for `id`. */
  def render(id: Long): Array[Byte] = {
    val family = id / 3
    val variant = (id % 3).toInt
    val frames = (0 until NFrames).map { f =>
      val px = new Array[Byte](Side * Side * 3)
      var r = 0
      while (r < Side) {
        var c = 0
        while (c < Side) {
          val v = (mix(family, f.toLong * 1009 +
            (r / Block).toLong * 31 + (c / Block)) & 0xffL).toInt
          val o = (r * Side + c) * 3
          px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
          c += 1
        }
        r += 1
      }
      var k = 0
      while (k < variant) {
        val pos = ((mix(family, 3000L + f * 7 + k) & 0x7fffffffL)
          % (Side * Side)).toInt
        val o = pos * 3
        val bumped = math.min(255, (px(o) & 0xff) + 6)
        px(o) = bumped.toByte; px(o + 1) = bumped.toByte; px(o + 2) = bumped.toByte
        k += 1
      }
      px
    }
    Video.encode(Side, Side, 3, fps = 10, frames)
  }

  /** One SCENE-STRUCTURED GVID per input id — the fixture corpus for
    * temporal video analytics ([[graft.operators.VideoShots]] shot
    * segmentation, the batch motion summary): the family corpus above
    * re-rolls its block noise EVERY frame (right for frame-hash dedup,
    * where frames must be uncorrelated; useless for temporal structure —
    * every frame would be a cut). Here each video is 2–5 scenes of 4–7
    * frames (lengths from the id hash, [[sceneLengths]]); within a scene
    * frames share ONE block-noise pattern plus two per-frame single-pixel
    * +6 bumps (below both the dHash sample grid's resolution and the
    * motion kernel's threshold 20), while scene patterns are independent
    * (a full-frame change at every cut). Pure function of the id.
    */
  def scenesFor(ids: DataFrame, idCol: String): DataFrame =
    RenderIds.fanOut(ids, idCol)
      .withColumn("gvid", scenesUdf(col("doc_id")))

  private val scenesUdf = udf { id: Long => renderScenes(id) }.asNondeterministic()

  /** Scene lengths (frames) of video `id` in the scene corpus. */
  def sceneLengths(id: Long): Seq[Int] = {
    val n = 2 + (mix(id, 1L) & 0x3L).toInt
    (0 until n).map(s => 4 + (mix(id, 100L + s) & 0x3L).toInt)
  }

  /** Deterministic scene-structured 32×32 BGR GVID for `id`. */
  def renderScenes(id: Long): Array[Byte] = {
    var globalF = 0
    val frames = sceneLengths(id).zipWithIndex.flatMap { case (len, s) =>
      (0 until len).map { _ =>
        val px = new Array[Byte](Side * Side * 3)
        var r = 0
        while (r < Side) {
          var c = 0
          while (c < Side) {
            val v = (mix(id, s.toLong * 7919 +
              (r / Block).toLong * 31 + (c / Block)) & 0xffL).toInt
            val o = (r * Side + c) * 3
            px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
            c += 1
          }
          r += 1
        }
        var k = 0
        while (k < 2) {
          val pos = ((mix(id, 4000L + globalF.toLong * 17 + k) & 0x7fffffffL)
            % (Side * Side)).toInt
          val o = pos * 3
          val bumped = math.min(255, (px(o) & 0xff) + 6)
          px(o) = bumped.toByte; px(o + 1) = bumped.toByte
          px(o + 2) = bumped.toByte
          k += 1
        }
        globalF += 1
        px
      }
    }
    Video.encode(Side, Side, 3, fps = 10, frames)
  }

  /** One VARIABLE-LENGTH GVID per input id with KNOWN clip-in-video
    * containment structure — the video sibling of
    * [[AudioCorpus.trackFor]], fixturing
    * [[graft.operators.VideoDedup.containmentPairs]] (the dedup corpus
    * has uniform lengths and no embedded-copy axis):
    *  - id % 4 == 0 → a [[ClipFrames]]-frame CLIP;
    *  - id % 4 == 3 → a [[TrackFrames]]-frame video that EMBEDS clip
    *    (id − 3) at frame offset [[EmbedOffset]] with a uniform +6 luma
    *    lift on every pixel — the embedded BYTES differ from the clip's,
    *    but the gradient-sign dHash is shift-invariant (away from the
    *    255 clamp), so matching is perceptual, frame-for-frame;
    *  - otherwise → a fresh 8–14-frame video.
    * Every non-embedded frame is independent block noise keyed by
    * (id, frame), so frame hashes are uncorrelated except for the planted
    * copies. Pure function of the id: identical corpus at every SF.
    */
  def clipTracksFor(ids: DataFrame, idCol: String): DataFrame =
    RenderIds.fanOut(ids, idCol)
      .withColumn("gvid", clipTrackUdf(col("doc_id")))

  private val clipTrackUdf = udf { id: Long => renderClipTrack(id) }.asNondeterministic()

  val ClipFrames = 6
  val TrackFrames = 20
  val EmbedOffset = 5

  /** Number of frames in video `id` of the containment corpus. */
  def clipTrackFrames(id: Long): Int =
    if (id % 4 == 0) ClipFrames
    else if (id % 4 == 3) TrackFrames
    else 8 + (mix(id, 66L) & 0x7L).toInt

  /** Deterministic containment-corpus GVID for `id` (see [[clipTracksFor]]). */
  def renderClipTrack(id: Long): Array[Byte] = {
    val n = clipTrackFrames(id)
    val frames = (0 until n).map { f =>
      val embedded = id % 4 == 3 && f >= EmbedOffset && f < EmbedOffset + ClipFrames
      val (srcId, srcF, lift) =
        if (embedded) (id - 3, f - EmbedOffset, 6) else (id, f, 0)
      val px = new Array[Byte](Side * Side * 3)
      var r = 0
      while (r < Side) {
        var c = 0
        while (c < Side) {
          val v0 = (mix(srcId * 131 + 17, srcF.toLong * 1013 +
            (r / Block).toLong * 31 + (c / Block)) & 0xffL).toInt
          val v = math.min(255, v0 + lift)
          val o = (r * Side + c) * 3
          px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
          c += 1
        }
        r += 1
      }
      px
    }
    Video.encode(Side, Side, 3, fps = 10, frames)
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
