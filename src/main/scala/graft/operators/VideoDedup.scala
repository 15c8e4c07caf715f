package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cv.ImageOps
import graft.sources.Video

/** Perceptual near-duplicate detection over VIDEO binary columns — the
  * last modality of the dedup family, composed from the pieces the engine
  * already has: GVID decode ([[Video.decodeFrames]] — the stubbed codec
  * boundary; a real mp4 decoder changes only that body), every-nth frame
  * SAMPLING (temporal subsampling before any expensive work), per-sampled-
  * frame dHash ([[ImageOps.dHash64]] on the raw plane, no PNG round-trip),
  * then the SAME Hamming-banded core as images/audio at FRAME level and a
  * vote aggregation at video level.
  *
  * Scale shape: fingerprinting is one map-side pass per video (decode +
  * k sampled hashes, k = nFrames/everyNth); the frame-hash table is
  * O(k·|videos|) rows; candidates are the banded equi-join on frame-hash
  * slices (never all-pairs); the video-level verdict is one hash agg over
  * frame matches. Two videos near-dup when ≥ `minOverlap` of their sampled
  * frames match within `maxDist` — robust to a re-encode (hashes stable),
  * an intro/outro edit (only some frames must match), and frame jitter
  * (every sampled frame of A is tested against every sampled frame of B
  * that lands in the same band bucket, not just the same index).
  */
object VideoDedup {

  /** GVID bytes → sampled frame hashes, NULL if undecodable. */
  private def sampleHashUdf(everyNth: Int) = udf { bytes: Array[Byte] =>
    if (bytes == null) None
    else Video.decodeFrames(bytes).map { case (rows, cols, ch, _, frames) =>
      frames.zipWithIndex.collect { case (px, i) if i % everyNth == 0 =>
        (i, ImageOps.dHash64(ImageOps.DecodedImage(rows, cols, ch, px)))
      }
    }
  }

  /** (id, frame_idx, phash, n_sampled) per sampled frame of each decodable
    * video — `n_sampled` rides along so the overlap denominator needs no
    * second pass over the blobs.
    */
  def frameHashes(videos: DataFrame, videoCol: String, idCol: String,
      everyNth: Int = 2): DataFrame =
    videos
      .select(col(idCol).as("id"),
        sampleHashUdf(everyNth)(col(videoCol)).as("fs"))
      .filter(col("fs").isNotNull)
      .select(col("id"), size(col("fs")).as("n_sampled"),
        explode(col("fs")).as("f"))
      .select(col("id"), col("f._1").as("frame_idx"),
        col("f._2").as("phash"), col("n_sampled"))

  /** Verified near-duplicate video pairs: (id_a < id_b, matched_frames,
    * overlap_ratio) where matched_frames counts A-side sampled frames with
    * at least one ≤-`maxDist` match in B, and overlap_ratio divides by the
    * SMALLER sampled-frame count (a clip contained in a longer video still
    * scores 1.0). Pairs with overlap_ratio >= `minOverlap` survive.
    */
  def nearDupPairs(videos: DataFrame, videoCol: String, idCol: String,
      everyNth: Int = 2, maxDist: Int = 3,
      minOverlap: Double = 0.6): DataFrame = {
    val fh = frameHashes(videos, videoCol, idCol, everyNth)
      // drop LOW-INFORMATION frames (black frames, title cards, uniform
      // scenes → dHash with almost no set bits): they match every video's
      // quiet frames, convey no identity, and their band buckets grow with
      // the CORPUS, not the content — the one skew source the banded join
      // cannot bound. Standard fingerprinting practice (same reason
      // audio fingerprints skip silence).
      .filter(bit_count(col("phash")) >= lit(4) &&
        bit_count(col("phash")) <= lit(60))
      .localCheckpoint(false)
    // frame-level banded join on a composite key; same-video collisions
    // (static scenes) are dropped by the different-video filter
    val framePairs = ImageDedup.hammingNearDupPairs(
      fh.select(struct(col("id"), col("frame_idx")).as("id"), col("phash")),
      maxDist)
      .select(col("id_a.id").as("vid_a"), col("id_a.frame_idx").as("fa"),
        col("id_b.id").as("vid_b"), col("id_b.frame_idx").as("fb"))
      .filter(col("vid_a") =!= col("vid_b"))
      // canonicalize: the struct ordering above sorts (id, frame_idx)
      // lexicographically, so a pair can arrive either way around
      .select(
        least(col("vid_a"), col("vid_b")).as("vid_a"),
        when(col("vid_a") <= col("vid_b"), col("fa")).otherwise(col("fb")).as("fa"),
        greatest(col("vid_a"), col("vid_b")).as("vid_b"))
    val counts = fh.select(col("id"), col("n_sampled")).distinct()
    framePairs
      .groupBy("vid_a", "vid_b")
      .agg(countDistinct(col("fa")).as("matched_frames"))
      .join(counts.select(col("id").as("vid_a"), col("n_sampled").as("na")), Seq("vid_a"))
      .join(counts.select(col("id").as("vid_b"), col("n_sampled").as("nb")), Seq("vid_b"))
      .select(col("vid_a"), col("vid_b"), col("matched_frames"),
        round(col("matched_frames").cast("double") /
          least(col("na"), col("nb")), 6).as("overlap_ratio"))
      .filter(col("overlap_ratio") >= minOverlap)
  }
}
