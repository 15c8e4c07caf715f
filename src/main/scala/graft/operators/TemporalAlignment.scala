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
