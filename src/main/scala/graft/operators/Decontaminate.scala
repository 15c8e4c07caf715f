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
}
