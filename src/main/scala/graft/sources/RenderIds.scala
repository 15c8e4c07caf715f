package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared id-projection for the synthetic render corpora (image / audio /
  * video `forIds`-family entry points): projects the id column and FANS IT
  * OUT to the session's core count before the per-row render UDF runs.
  *
  * Why (guide §2.5 / §6.1): Spark sizes scan splits by BYTES, and an id
  * projection is ~8 bytes/row — a whole SF's id list packs into one or two
  * scan tasks, so the expensive per-row work downstream (PNG/WAV/GVID
  * render, then decode in the consumer) runs near-single-threaded however
  * many cores the cluster has. The per-row cost is invisible to byte-based
  * split sizing at ANY scale, so the fan-out is a property of the render
  * seam, not a local-mode tune. The repartition shuffles only the 8-byte
  * ids (the payload is rendered AFTER the exchange) and uses an EXPLICIT
  * partition count: AQE's byte-targeted coalescing would see a few KB of
  * ids and fold the fan-out back into one task.
  *
  * Frames already at or above the core count (e.g. staged multi-file
  * layouts, callers that pre-repartitioned) pass through untouched.
  */
private[graft] object RenderIds {

  def fanOut(ids: DataFrame, idCol: String): DataFrame = {
    val projected = ids.select(col(idCol).cast("long").as("doc_id"))
    if (projected.isStreaming) projected // no .rdd on streaming frames
    else {
      val cores = projected.sparkSession.sparkContext.defaultParallelism
      if (projected.rdd.getNumPartitions >= cores) projected
      else projected.repartition(cores)
    }
  }
}
