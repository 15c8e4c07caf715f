package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style hashed-unigram importance weights (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"): score every
  * document by how much its token distribution looks like a TARGET slice
  * of the corpus versus the RAW corpus, using hashed n-gram bag features.
  *
  * weight(doc) = avg over tokens of
  *   ln( p_target(bucket(tok)) / p_raw(bucket(tok)) )
  * with add-one smoothing over a FIXED number of hash buckets. Selection
  * then keeps the highest-weight documents (EXT48's budget selector or
  * EXT27's percentile gate compose directly downstream).
  *
  * Scale shape: hashing is the whole trick — the bucket-count table has at
  * most `buckets` rows BY CONSTRUCTION (default 1024), regardless of
  * vocabulary or corpus size, so broadcasting it back onto the token
  * stream is principled (contrast EXT13, where the vocabulary is unbounded
  * and the broadcast hint is deliberately absent). One token-bucket
  * aggregate + one per-doc aggregate; nothing driver-side.
  */
object Dsir {

  /** @param isTarget row predicate selecting the target slice (evaluated
    *                 per document; e.g. `col("lang") === "en"`).
    */
  def importanceWeights(
      df: DataFrame, textCol: String, idCol: String,
      isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, s"importanceWeights: buckets must be >= 1, got $buckets")
    val toks = df
      .select(col(idCol), isTarget.as("is_tgt"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("bucket", Sampling.hashBucket(col("tok"), buckets))
    val counts = toks.groupBy("bucket").agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("n_tgt"))
    val totals = counts.agg(
      sum("n_raw").as("t_raw"), sum("n_tgt").as("t_tgt"))
    val ratios = counts.crossJoin(totals)
      .select(col("bucket"),
        (log((col("n_tgt") + 1.0) / (col("t_tgt") + buckets)) -
          log((col("n_raw") + 1.0) / (col("t_raw") + buckets))).as("log_ratio"))
    toks.join(broadcast(ratios), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        round(avg("log_ratio"), 6).as("dsir_weight"))
  }
}
