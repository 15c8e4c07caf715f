package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class DsirSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("target == raw corpus makes every weight exactly 0") {
    val docs = Seq((0L, "alpha beta"), (1L, "gamma delta epsilon"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(docs, "text", "doc_id", isTarget = lit(true))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // n_tgt == n_raw and t_tgt == t_raw per bucket → log ratio 0 per token.
    assert(w == Map(0L -> ((2L, 0.0)), 1L -> ((3L, 0.0))))
  }

  test("documents made of target-only vocabulary outrank raw-only vocabulary") {
    val target = (0L until 40L).map(i => (i, "tgtword" + (i % 5), "en"))
    val other = (40L until 80L).map(i => (i, "rawword" + (i % 5), "xx"))
    val docs = (target ++ other).toDF("doc_id", "word", "lang")
      .select($"doc_id", concat($"word", lit(" "), $"word").as("text"), $"lang")
    val w = Dsir.importanceWeights(docs, "text", "doc_id",
      isTarget = $"lang" === "en", buckets = 64)
    val byDoc = w.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val tgtAvg = (0L until 40L).map(byDoc).sum / 40
    val rawAvg = (40L until 80L).map(byDoc).sum / 40
    assert(tgtAvg > 0.0 && rawAvg < 0.0 && tgtAvg > rawAvg)
  }

  test("weights are deterministic across runs and every doc with tokens appears") {
    val docs = (0L until 50L)
      .map(i => (i, s"tok${i % 7} tok${i % 3} shared", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val a = Dsir.importanceWeights(docs, "text", "doc_id", $"lang" === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = Dsir.importanceWeights(docs, "text", "doc_id", $"lang" === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b))
    assert(a.length == 50 && a.forall(_._2 == 3L))
  }
}
