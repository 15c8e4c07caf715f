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
}
