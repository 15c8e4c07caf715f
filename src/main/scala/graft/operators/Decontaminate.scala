package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination for training corpora: flag every corpus
  * document that shares at least one word n-gram shingle with any document
  * of an evaluation/benchmark set — the standard guard against test-set
  * leakage into training data.
  *
  * Scale design: both sides are a map-side explode of DISTINCT per-doc
  * shingles (distinct first, so a shingle repeated inside one document adds
  * one row, not many), joined on the shingle string — an equi join whose
  * eval side is benchmark-sized, so AQE broadcasts it when it fits (no
  * forced hint; eval suites can grow). One aggregate keyed by corpus doc
  * follows. Nothing is quadratic in the corpus; a production variant would
  * join on xxhash64(shingle) to shrink shuffle keys, which this keeps as a
  * note because the raw string is what the cross-engine oracle can check.
  */
object Decontaminate {

  /** Per contaminated corpus document: how many distinct eval documents it
    * overlaps (`n_eval_docs`) and on how many distinct shingles
    * (`n_shingles`). Documents with no overlap are absent — the clean
    * majority never leaves the map side. Documents shorter than n tokens
    * contain no n-gram and cannot be flagged ([[TextFunctions.strictShingles]]).
    */
  def overlaps(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    require(n >= 1, s"shingle n must be >= 1, got $n")
    // fused one-pass shingle-set build (the interpreted
    // transform+slice+array_join HOF chain costs ~45ms CPU/doc at these
    // document lengths; set equality with the HOF form is spec-pinned)
    def exploded(df: DataFrame, outId: String) = df.select(
      col(idCol).as(outId),
      explode(TextFunctions.wordShingleSetFast(col(textCol), n)).as("sh"))
    exploded(corpus, "doc_id")
      .join(exploded(evalSet, "eval_id"), "sh")
      .groupBy("doc_id")
      .agg(countDistinct(col("eval_id")).as("n_eval_docs"),
        countDistinct(col("sh")).as("n_shingles"))
  }

  /** Per-document contamination FRACTION: of each corpus document's
    * distinct n-gram shingles, what share also occurs anywhere in the eval
    * set? The graded version of [[overlaps]] — thresholding the fraction
    * (rather than "any overlap") is how real decontamination pipelines
    * trade recall against over-dropping (e.g. the 70%-of-13-grams rule in
    * GPT-3's appendix).
    *
    * Every corpus document appears in the output, clean ones with
    * `contamination = 0` — the denominator (per-doc distinct-shingle
    * count) rides along each exploded shingle row, so one corpus scan,
    * one shingle evaluation, one left join against the distinct eval
    * shingles, and one per-doc aggregate produce both counts. Documents
    * shorter than n tokens (or with null text) have no shingles:
    * contamination 0 of 0 windows, emitted as 0.0 (nothing to leak).
    */
  def contaminationFraction(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    require(n >= 1, s"shingle n must be >= 1, got $n")
    // ONE corpus scan and ONE shingle-UDF evaluation: the per-doc set size
    // rides along each exploded row (explode_outer keeps shingle-less and
    // null-text docs as a single null-shingle row, which the left join
    // scores as 0 hits of 0 windows)
    val exploded = corpus.select(col(idCol).as("doc_id"),
        TextFunctions.wordShingleSetFast(col(textCol), n).as("shs"))
      .select(col("doc_id"),
        coalesce(size(col("shs")), lit(0)).cast("long").as("n_shingles"),
        explode_outer(col("shs")).as("sh"))
    val evalShingles = evalSet
      .select(explode(TextFunctions.wordShingleSetFast(col(textCol), n)).as("sh"))
      .distinct()
      .withColumn("hit", lit(1))
    exploded.join(evalShingles, Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(first(col("n_shingles")).as("n_shingles"),
        count(col("hit")).as("n_contaminated")) // shs is a set: 1 row per shingle
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        when(col("n_shingles") === 0, lit(0d))
          .otherwise(round(col("n_contaminated") / col("n_shingles"), 6))
          .as("contamination"))
  }
}
