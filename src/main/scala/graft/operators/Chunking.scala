package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size overlapping character chunking — the context-window
  * preparation step of a training/RAG pipeline (split each document into
  * `size`-char windows every `stride` chars, so consecutive chunks overlap
  * by `size - stride`).
  *
  * Scale shape: map-side ONLY — sequence + explode + substring, no shuffle
  * anywhere (plan-guarded: zero Exchanges). The chunk index is derived
  * arithmetically from the start offset, so the explode carries no
  * positional state and any engine reproduces the exact same rows.
  */
object Chunking {

  /** One row per (doc, chunk): doc_id, chunk_idx (1-based), start (1-based
    * char offset), chunk text, chunk length. Empty/null text yields no
    * chunks; the final chunk may be shorter than `size`.
    */
  def charChunks(docs: DataFrame, textCol: String, idCol: String,
      size: Int = 200, stride: Int = 150): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(stride > 0, s"stride must be positive, got $stride")
    val len = length(col(textCol))
    // sequence(1, 0) would count DOWN (Spark picks step -1 when start>stop),
    // so empty text must short-circuit to an empty array explicitly
    val starts = when(len >= 1, sequence(lit(1), len, lit(stride)))
      .otherwise(array().cast("array<int>"))
    docs
      .select(
        col(idCol).cast("long").as("doc_id"),
        col(textCol).as("__text"),
        explode(starts).as("start"))
      .select(
        col("doc_id"),
        (expr(s"(start - 1) DIV $stride") + 1L).as("chunk_idx"),
        col("start").cast("long").as("start"),
        col("__text").substr(col("start"), lit(size)).as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
  }
}
