package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data prep: concatenate documents in a
  * deterministic order and chunk the token stream into fixed-length
  * sequences. Each document is assigned the bin its FIRST token lands in
  * (concat-and-chunk: a document may straddle a bin boundary; the start
  * offset's bin is the pack a sequence sampler reads it from).
  *
  * Scale design: the running offset is a window sum PARTITIONED by
  * `groupCol` — packing is independent per group (source, file shard, …),
  * so no global ordering or single-partition window exists anywhere in the
  * plan. At 100 TB the caller picks a grouping granular enough that one
  * group's documents fit a task; bins are a pure function of (group, order
  * key, token counts), so re-runs and speculative retries agree exactly.
  */
object Packing {

  /** Adds `offset` (the document's starting token offset within its group's
    * concatenated stream) and `bin` (0-based sequence index,
    * floor(offset / seqLen)). The window is an explicit ROWS frame so
    * duplicate order keys still produce a running (not peer-grouped) sum;
    * pass a unique `orderCol` for a deterministic layout.
    */
  def packBins(df: DataFrame, groupCol: String, orderCol: String,
      tokCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    Seq("offset", "bin").foreach { c =>
      require(!df.columns.contains(c),
        s"packBins emits column $c; input already has a column named $c")
    }
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("offset", sum(col(tokCol)).over(w) - col(tokCol))
      .withColumn("bin", floor(col("offset") / seqLen))
  }

  /** Training-output shard assignment + balance audit: shard = md5-derived
    * uniform hash of the id modulo `nShards` — a pure per-row function, so
    * the assignment itself adds NO shuffle (the subsequent write just
    * partitions by `shard`) and re-runs/retries agree exactly. The report
    * is one aggregate over nShards rows: per-shard doc/token volume plus
    * each shard's relative token deviation from the uniform ideal — the
    * audit that decides whether hash sharding suffices or a skewed corpus
    * needs salting. Output: (shard, n_docs, shard_tokens, rel_dev).
    */
  def shardReport(df: DataFrame, idCol: String, tokCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val per = df
      .select(Sampling.hashBucket(col(idCol), nShards).as("shard"),
        col(tokCol).cast("long").as("__tok"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("__tok").as("shard_tokens"))
    // join onto the full 0..nShards-1 spine: a shard that received NOTHING
    // is the worst-skew signal and must show as rel_dev = -1, not vanish
    val spine = df.sparkSession.range(nShards).select(col("id").as("shard"))
    val tot = per.agg(sum("shard_tokens").as("__total"))
    spine.join(per, Seq("shard"), "left").crossJoin(tot)
      .select(col("shard"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("shard_tokens"), lit(0L)).as("shard_tokens"),
        round(coalesce(col("shard_tokens"), lit(0L)) /
          (col("__total") / nShards) - 1.0, 6).as("rel_dev"))
  }
}
