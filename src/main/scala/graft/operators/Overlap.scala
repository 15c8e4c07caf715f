package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Cross-source shingle-overlap audit: for every pair of corpus sources,
  * how many distinct word n-gram shingles they share and the Jaccard of
  * their shingle sets.
  *
  * This is the corpus-level view of contamination that EXT26/EXT41 give
  * per-document: before mixing sources into a training set you want to
  * know which sources are near-copies of each other (mirrors, scrapes of
  * the same site, re-crawls), because per-pair overlap decides whether two
  * "sources" should share one dedup pass or a mixing weight.
  *
  * Scale shape (the 100 TB question): one shuffle produces the distinct
  * (source, shingle) set; the self-join is an equi join on the shingle
  * whose per-key fanout is bounded by the NUMBER OF SOURCES (a gram
  * contributes at most C(nSources, 2) pairs no matter how many documents
  * repeat it — multiplicity died in the distinct), and the final
  * aggregate emits at most nSources² rows. The per-source size table is
  * nSources rows, so AQE broadcasts the enrichment joins. Nothing here is
  * quadratic in documents.
  */
object Overlap {

  /** Per-document n-gram novelty in id order: the fraction of a document's
    * DISTINCT word n-grams whose first corpus occurrence (minimum id) is
    * this document. The novelty curve is the diminishing-returns audit of
    * a growing corpus — novelty collapsing toward 0 over an id range means
    * new deliveries are re-treading existing content and dedup should bite
    * before training does.
    *
    * Scale shape: distinct (doc, gram) explode → one gram-keyed min-id
    * aggregate (partials apply) → equi join back on the gram → one doc
    * aggregate. The gram frame is touched twice but never leaves the
    * gram partitioning between the agg and the join; nothing is pairwise.
    */
  def ngramNovelty(
      df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    require(n >= 1, s"ngramNovelty: n must be >= 1, got $n")
    val grams = df
      .select(col(idCol).as("id"),
        explode(TextFunctions.wordShingleSetFast(col(textCol), n)).as("gram"))
    val firstSeen = grams.groupBy("gram").agg(min("id").as("first_id"))
    grams.join(firstSeen, "gram")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_id") === col("id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", round(col("n_novel").cast("double") / col("n_grams"), 6))
  }

  /** Pairs (src_a < src_b) with ≥ 1 shared shingle; symmetric pairs are
    * reported once. Jaccard = shared / (|A| + |B| − shared), 6 dp.
    *
    * The pair stage is ONE gram-keyed aggregate, not a gram self-join:
    * each gram collects its (≤ nSources, bounded by construction) sorted
    * source set, and the C(s,2) ordered pairs expand MAP-SIDE from that
    * array — so the big distinct-gram frame crosses the wire once, and
    * nothing in the plan can fan out beyond nSources² rows.
    */
  def sourceShingleOverlap(
      df: DataFrame, textCol: String, srcCol: String, n: Int): DataFrame = {
    require(n >= 1, s"sourceShingleOverlap: n must be >= 1, got $n")
    val grams = df
      .select(col(srcCol).as("src"),
        explode(TextFunctions.wordShingleSetFast(col(textCol), n)).as("gram"))
      .distinct()
    val sizes = grams.groupBy("src").agg(count(lit(1)).as("n_grams"))
    // all ordered pairs (i < j) of the sorted per-gram source set, expanded
    // with nested transform over the array — no join, no row explosion
    // beyond C(|srcs|, 2) per gram
    val pairs = grams.groupBy("gram")
      .agg(sort_array(collect_set(col("src"))).as("srcs"))
      .where(size(col("srcs")) >= 2)
      .select(explode(flatten(transform(col("srcs"), (a, i) =>
        transform(slice(col("srcs"), i + lit(2), size(col("srcs"))),
          b => struct(a.as("src_a"), b.as("src_b")))))).as("p"))
    val shared = pairs
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
    shared
      .join(sizes.select(col("src").as("src_a"), col("n_grams").as("n_a")), "src_a")
      .join(sizes.select(col("src").as("src_b"), col("n_grams").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("shared_grams"),
        round(col("shared_grams") /
          (col("n_a") + col("n_b") - col("shared_grams")), 6).as("jaccard"))
  }
}
