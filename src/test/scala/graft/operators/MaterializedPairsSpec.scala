package graft.operators

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The session-scoped pairs materialization (ext82/84/86's shared
  * substrate) and the candidate-fanout observability contract.
  */
class MaterializedPairsSpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.sources.Tables.documents(spark, sf)

  test("setSimPairs memoizes per (session, key, dials): same object back, clear() forgets") {
    MaterializedPairs.clear()
    val a = MaterializedPairs.setSimPairs(docs, "text", "doc_id", 3, 0.8, key = "spec-a")
    val b = MaterializedPairs.setSimPairs(docs, "text", "doc_id", 3, 0.8, key = "spec-a")
    assert(a eq b, "same key must return the SAME materialized frame")
    val c = MaterializedPairs.setSimPairs(docs, "text", "doc_id", 3, 0.7, key = "spec-a")
    assert(!(a eq c), "different dials must not collide on the cache key")
    // the cached frame is persisted and already materialized (first caller
    // counted it), so a consumer action reads the cache
    assert(a.storageLevel.useMemory || a.storageLevel.useDisk, "pairs frame must be persisted")
    MaterializedPairs.clear()
    val d = MaterializedPairs.setSimPairs(docs, "text", "doc_id", 3, 0.8, key = "spec-a")
    assert(!(a eq d), "clear() must drop the memo")
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "clear() must unpersist the dropped frames")
    MaterializedPairs.clear()
  }

  test("cached pairs equal a fresh setSimilarityJoin run") {
    MaterializedPairs.clear()
    val cached = MaterializedPairs.setSimPairs(docs, "text", "doc_id", 3, 0.8, key = "spec-eq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fresh = Dedup.setSimilarityJoin(docs, "text", "doc_id", n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cached == fresh)
    assert(cached.nonEmpty, "fixture must plant pairs or the equality proves nothing")
    MaterializedPairs.clear()
  }

  test("the setsim_candidates observed metric reports the candidate fanout to listeners") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("setsim_candidates")
          .foreach(row => seen.add(row.getAs[Long]("n_candidates")))
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Dedup.setSimilarityJoin(docs, "text", "doc_id", n = 3, threshold = 0.8)
        .write.format("noop").mode("overwrite").save()
      // listener delivery is async on the listener bus — poll briefly
      val deadline = System.nanoTime() + 30e9.toLong
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      assert(seen.size() >= 1, "observed metric never reached the listener")
      val n = seen.peek()
      // measured 28 candidates at sf0.001; the metric must be the real
      // fanout, not a constant
      assert(n > 0 && n <= 500, s"candidate fanout metric out of range: $n")
    } finally spark.listenerManager.unregister(listener)
  }
}
