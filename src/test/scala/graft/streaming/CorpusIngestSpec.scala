package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Streaming corpus ingestion: parse-with-drop, quality gate, and
  * watermark-bounded content dedup across micro-batches and restarts.
  */
class CorpusIngestSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"corpus-$tag").toString

  private def doc(id: Long, text: String, source: String, ts: String): String =
    s"""{"doc_id":$id,"text":"$text","source":"$source","ingest_ts":"$ts"}"""

  test("parse drops malformed JSON and records missing required fields") {
    val lines = Seq(
      doc(1, "alpha beta gamma delta epsilon", "a", "2026-01-01 00:00:00"),
      """{"doc_id":2,"text":"no source or ts"}""",
      "not json at all",
      """{"text":"no id","source":"a","ingest_ts":"2026-01-01 00:00:10"}"""
    ).toDF("value")
    val parsed = CorpusIngest.parse(lines)
    assert(parsed.count() == 1)
    assert(parsed.select("doc_id").head().getLong(0) == 1L)
  }

  test("streaming ingest: gate + digest dedup across micro-batches and restarts") {
    val table = tmp("table"); val ckpt = tmp("ckpt")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val source = MemoryStream[String]
    val prepared = CorpusIngest.prepare(
      CorpusIngest.parse(source.toDF().toDF("value")),
      minTokens = 5, minDistinctRatio = 0.2, watermarkDelay = "10 minutes")
    def runOnce(): Unit =
      CorpusIngest.writeCorpus(prepared, table, ckpt).awaitTermination()

    // batch 1: one good doc, one too short, one too repetitive, one
    // in-batch duplicate of the good doc's text (later id)
    source.addData(
      doc(1, "alpha beta gamma delta epsilon zeta", "srcA", "2026-01-01 00:00:00"),
      doc(2, "hi there", "srcA", "2026-01-01 00:00:01"),
      doc(3, "a a a a a a a a a a", "srcA", "2026-01-01 00:00:02"),
      doc(4, "alpha beta gamma delta epsilon zeta", "srcB", "2026-01-01 00:00:03"))
    runOnce()
    val afterB1 = spark.read.parquet(table)
    assert(afterB1.count() == 1, "gate + in-batch dedup must keep exactly one good doc")
    // WHICH of the two same-digest duplicates (ids 1 and 4) survives a
    // shuffled streaming dedup is not contractually ordered — assert on the
    // surviving CONTENT, and carry the survivor's id into the batch-2 check
    val survivor = afterB1.select("doc_id", "text").head()
    assert(survivor.getString(1) == "alpha beta gamma delta epsilon zeta")
    val survivorId = survivor.getLong(0)
    assert(Set(1L, 4L).contains(survivorId))

    // batch 2 on a fresh query from the same checkpoint: a replayed
    // duplicate within the watermark drops, a genuinely new doc lands
    source.addData(
      doc(5, "alpha beta gamma delta epsilon zeta", "srcC", "2026-01-01 00:05:00"),
      doc(6, "one two three four five six seven", "srcC", "2026-01-01 00:05:01"))
    runOnce()
    val afterB2 = spark.read.parquet(table)
    assert(afterB2.count() == 2)
    assert(afterB2.select("doc_id").collect().map(_.getLong(0)).toSet == Set(survivorId, 6L))

    // the landing table is source-partitioned (corpus analog of the
    // (camera_id, day) frame sink layout)
    val dirs = new java.io.File(table).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.contains("source=srcA") && dirs.contains("source=srcC"))
  }

  test("prepare on a BATCH frame applies the same gate with whole-input dedup") {
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "a", java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      (2L, "alpha beta gamma delta epsilon zeta", "b", java.sql.Timestamp.valueOf("2026-01-02 00:00:00")),
      (3L, "hi", "a", java.sql.Timestamp.valueOf("2026-01-03 00:00:00")))
      .toDF("doc_id", "text", "source", "ingest_ts")
    val kept = CorpusIngest.prepare(batch, minTokens = 5, minDistinctRatio = 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.size == 1 && (kept == Set(1L) || kept == Set(2L)))
  }
}
