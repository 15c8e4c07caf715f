package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The MODALITY-AGNOSTIC temporal-alignment vote shared by video near-dup
  * ([[VideoDedup]], frame units) and audio clip containment
  * ([[AudioContainment]], fixed-duration window units): given matched
  * time-indexed unit pairs between two items, score each item pair by the
  * support of its best single temporal alignment — matched pairs are
  * histogrammed by their time-index offset (ta − tb) and only the best
  * ±`jitter` offset window counts, so scattered coincidental matches (a
  * shuffled montage of A's frames, two audio tracks sharing one jingle
  * window by chance) never score like a genuinely aligned copy, while
  * re-encodes, splices, contained clips and uniformly time-shifted copies
  * all concentrate their matches at one offset and keep their scores.
  *
  * Scale shape: two keyed aggregations plus one RANGE-frame window pass
  * over the per-pair offset histogram — no self-join, no per-pair driver
  * work; the histogram is at most |matched pairs| rows and the window
  * partitions by (id_a, id_b), so skew is bounded by the densest single
  * pair.
  */
object TemporalAlignment {

  /** Popcount band outside which a 64-bit perceptual hash is considered
    * LOW-INFORMATION (near-uniform content — black frames, title cards,
    * silence windows): such units match every item's quiet units, convey
    * no identity, and their band buckets grow with the CORPUS, not the
    * content — the one skew source a Hamming-banded join cannot bound.
    * Same [4, 60] band as [[VideoDedup.LowInfoMinBits]]/`LowInfoMaxBits`
    * (the video path keeps its own Long-side copy for the streaming
    * suppressor's row-level state updates).
    */
  def informative(hash: Column, minBits: Int = 4, maxBits: Int = 60): Column =
    bit_count(hash) >= lit(minBits) && bit_count(hash) <= lit(maxBits)

  /** Per-pair alignment scores over matched unit pairs.
    *
    * @param unitPairs matched time-indexed unit pairs — columns
    *   (id_a, id_b, ta, tb), canonicalized so id_a < id_b and ta/tb are
    *   the time indices on the a/b side respectively
    * @param counts post-filter per-item unit counts — columns (id, n_kept);
    *   BOTH numerator and denominator must count only units that were
    *   allowed to match (r8 ADVICE on the video path)
    * @param jitter offsets within ±jitter of the best offset count as the
    *   same alignment (one unit of temporal jitter either side)
    * @return one row per item pair: (id_a, id_b, na, nb, matched_units,
    *   aligned_units, best_off) where matched_units counts distinct
    *   matched units on the SMALLER side (counting the larger side could
    *   exceed the denominator when many of its units match few of the
    *   other's), aligned_units is the best ±jitter offset-window support
    *   and best_off its center offset (ta − tb; smallest offset wins ties
    *   deterministically)
    */
  /** The [[alignedOverlap]] vote over two IN-MEMORY unit lists — the
    * per-pair kernel the streaming watchlist monitor
    * ([[graft.streaming.WatchlistMonitor]]) runs map-side against a
    * broadcast clip: O(|fa|·|fb|) comparisons bounded by item length,
    * mirroring the DataFrame core exactly — matched = distinct
    * small-side units; per-offset distinct small-side counts; best
    * ±jitter window; ties → smallest center offset (the
    * `max_by(off, struct(win, -off))` tie-break). Returns
    * (matched_units, aligned_units, best_off) with best_off = ta − tb
    * like the core ([[VideoDedup.alignLists]] is the refine-stage
    * sibling without the offset; parity with the core is spec-pinned
    * for both). */
  private[graft] def alignListsFull(fa: Seq[(Int, Long)],
      fb: Seq[(Int, Long)], maxDist: Int, jitter: Int): (Long, Long, Int) = {
    val smallIsA = fa.length <= fb.length
    val matchedSmall = scala.collection.mutable.Set.empty[Int]
    val perOffset =
      scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Set[Int]]
    fa.foreach { case (ta, ha) =>
      fb.foreach { case (tb, hb) =>
        if (java.lang.Long.bitCount(ha ^ hb) <= maxDist) {
          val st = if (smallIsA) ta else tb
          matchedSmall += st
          perOffset.getOrElseUpdate(ta - tb,
            scala.collection.mutable.Set.empty[Int]) += st
        }
      }
    }
    if (matchedSmall.isEmpty) return (0L, 0L, 0)
    var bestWin = -1L
    var bestOff = 0
    perOffset.keys.toSeq.sorted.foreach { off =>
      val win = (off - jitter to off + jitter)
        .map(o => perOffset.get(o).map(_.size.toLong).getOrElse(0L)).sum
      if (win > bestWin) { bestWin = win; bestOff = off }
    }
    (matchedSmall.size.toLong, bestWin, bestOff)
  }

  def alignedOverlap(unitPairs: DataFrame, counts: DataFrame,
      jitter: Int): DataFrame = {
    val withCounts = unitPairs
      .join(counts.select(col("id").as("id_a"), col("n_kept").as("na")),
        Seq("id_a"))
      .join(counts.select(col("id").as("id_b"), col("n_kept").as("nb")),
        Seq("id_b"))
      .withColumn("small_t",
        when(col("na") <= col("nb"), col("ta")).otherwise(col("tb")))
      .withColumn("off", col("ta") - col("tb"))
      .localCheckpoint(false) // consumed by both aggs below
    val matched = withCounts.groupBy("id_a", "id_b")
      .agg(countDistinct(col("small_t")).as("matched_units"))
    val perOffset = withCounts
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"), col("off"))
      .agg(countDistinct(col("small_t")).as("cnt"))
    val w = Window.partitionBy("id_a", "id_b").orderBy("off")
      .rangeBetween(-jitter, jitter)
    perOffset
      .withColumn("win", sum(col("cnt")).over(w))
      .groupBy("id_a", "id_b", "na", "nb")
      .agg(max(col("win")).as("aligned_units"),
        max_by(col("off"), struct(col("win"), -col("off"))).as("best_off"))
      .join(matched, Seq("id_a", "id_b"))
  }
}
