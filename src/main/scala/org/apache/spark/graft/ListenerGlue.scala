package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is private[spark]; per-query metric
  * attribution (Bench, tools.Time) needs a DETERMINISTIC drain of the async
  * listener bus between queries — a fixed sleep attributes a loaded bus's
  * late task-end events to the wrong query. Same in-package shim practice
  * as [[org.apache.spark.sql.graft.ColumnGlue]].
  */
object ListenerGlue {
  /** Block until every event posted so far has been delivered to every
    * registered listener (bounded by `spark.sql.ui.retainedExecutions`-scale
    * queues; returns immediately on an idle bus). `waitUntilEmpty()` throws
    * after its internal 10 s bound if some queue still lags — a drain
    * exists to IMPROVE attribution, so a lagging bus degrades to the
    * best-effort reading instead of aborting the whole bench run.
    */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
