package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.HeavyHitters
import graft.operators.HeavyHitters.MgBuf

/** Streaming trending-item detection: a Misra–Gries heavy-hitters sketch
  * per group key, maintained ACROSS micro-batches in keyed state — "what's
  * trending per event type right now" with O(k) state per key forever,
  * regardless of how many distinct items stream past (the unbounded-state
  * alternative, a per-(group, item) count, grows without bound and is
  * exactly what this sketch exists to avoid at scale).
  *
  * Reuses the batch [[HeavyHitters]] reduce step verbatim, so the
  * streaming sketch inherits its proven bound: any item with true count >
  * n_total/(k+1) since stream start is guaranteed present. Emits the
  * current top `topN` per group every micro-batch (Update mode — the
  * dashboard refresh contract).
  */
object Trending {

  final case class TrendRow(group: String, item: String, est_n: Long, n_total: Long, rank: Int)

  /** `df` must have (groupCol, itemCol) string columns; works identically
    * on batch frames (mapGroups semantics without state carry-over).
    */
  def trendingTopK(df: DataFrame, groupCol: String, itemCol: String,
      k: Int = 64, topN: Int = 5): DataFrame = {
    require(topN <= k, s"topN ($topN) must be <= k ($k)")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(itemCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MgBuf, TrendRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (group: String, rows: Iterator[(String, String)], state: GroupState[MgBuf]) => {
          var buf = state.getOption.getOrElse(MgBuf(Map.empty, 0L))
          rows.foreach { case (_, item) => buf = HeavyHitters.mgReduce(k)(buf, item) }
          state.update(buf)
          buf.counters.toSeq
            .sortBy { case (item, n) => (-n, item) } // deterministic: count desc, item asc
            .take(topN)
            .zipWithIndex
            .map { case ((item, n), i) => TrendRow(group, item, n, buf.n, i + 1) }
            .iterator
        })(Encoders.product[MgBuf], Encoders.product[TrendRow])
      .toDF()
  }
}
