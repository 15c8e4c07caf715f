package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus indexing operators: inverted-index (posting-list) construction and
  * bigram association scoring (PMI) — the retrieval-side counterparts of the
  * dedup/similarity surface (a training-data pipeline builds these to audit
  * coverage and to mine collocations for tokenizer/quality work).
  */
object Indexing {

  /** term → (document frequency, capped sorted posting list).
    *
    * Scale shape: ONE shuffle total. The df count, the per-term rank, and
    * the final posting-list aggregate all hash-partition by `term`, so Spark
    * plans a single Exchange and reuses it (window sort then agg — plan
    * guarded). The row_number cap bounds the collect_list buffer at `cap`
    * doc ids per term: a stopword's billion-document posting list can never
    * OOM an aggregation buffer, because rows past the cap are dropped BEFORE
    * the collect. `df` stays the exact uncapped count (it comes from the
    * whole-partition COUNT window, not from the surviving rows).
    */
  def invertedIndex(docs: DataFrame, textCol: String, idCol: String,
      cap: Int = 32): DataFrame = {
    require(cap > 0, s"posting cap must be positive, got $cap")
    val toks = docs.select(
      col(idCol).cast("long").as("doc_id"),
      explode(TextFunctions.tokenSet(col(textCol))).as("term"))
    val byTerm = Window.partitionBy("term")
    toks
      .withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("rn", row_number().over(byTerm.orderBy("doc_id")))
      .filter(col("rn") <= cap)
      .groupBy("term")
      .agg(
        max("df").as("df"),
        sort_array(collect_list("doc_id")).as("postings"))
  }

  /** Pointwise mutual information of adjacent-token bigrams:
    * pmi = ln( p(w1 w2) / (p(w1) · p(w2)) ) over corpus-level counts,
    * reported for bigrams seen at least `minCount` times.
    *
    * Scale shape: two hash aggregates (unigram counts, bigram counts — both
    * with map-side partials) plus two equi joins of the surviving bigrams
    * back to the unigram-count table. The unigram table scales with the
    * vocabulary, so those joins carry NO broadcast hint (AQE broadcasts iff
    * it actually fits); the corpus totals ride along as a one-row aggregate
    * cross-join, which is always broadcast-safe. The division/log chain is
    * written identically to the SQL oracle so the rounded doubles hash-match.
    */
  def bigramPmi(docs: DataFrame, textCol: String, minCount: Long = 5L): DataFrame = {
    val toks = docs.select(TextFunctions.tokens(col(textCol)).as("toks"))
    val totals = toks.agg(
      sum(size(col("toks"))).cast("double").as("n_uni"),
      sum(greatest(size(col("toks")) - 1, lit(0))).cast("double").as("n_bi"))
    val uni = toks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    // fused one-pass bigram build for the hot branch (the interpreted
    // transform+slice+array_join HOF chain dominates this operator's cost;
    // element-for-element parity with wordBigrams∘tokens is spec-pinned)
    val bi = docs
      .select(explode(TextFunctions.wordShinglesFast(col(textCol), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    bi
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(uni.select(col("tok").as("w1"), col("c1").as("c1a")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c1").as("c1b")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(
        col("bigram"), col("c12"),
        round(log(
          (col("c12") / col("n_bi")) /
            ((col("c1a") / col("n_uni")) * (col("c1b") / col("n_uni")))), 6)
          .as("pmi"))
  }
}
