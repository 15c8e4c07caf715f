package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ChunkingSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("charChunks: overlapping windows with a short tail chunk") {
    val d = Seq((7L, "abcdefghij")).toDF("doc_id", "text") // 10 chars
    val rows = Chunking.charChunks(d, "text", "doc_id", size = 4, stride = 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, 1L, "abcd", 4L),   // 1..4
      (2L, 4L, "defg", 4L),   // overlap of 1 char with previous
      (3L, 7L, "ghij", 4L),
      (4L, 10L, "j", 1L)))    // tail shorter than size
  }

  test("charChunks: empty and null text yield no chunks") {
    val d = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "ok"))
      .toDF("doc_id", "text")
    val rows = Chunking.charChunks(d, "text", "doc_id", size = 5, stride = 5)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L))
    assert(rows.head.getString(3) == "ok")
  }

  test("charChunks: stride == size gives exact non-overlapping cover") {
    val text = "x" * 100
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Chunking.charChunks(d, "text", "doc_id", size = 25, stride = 25)
      .collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(4)).sum == 100L) // full cover, no overlap
  }

  test("charChunks: reconstruction — stride-aligned prefixes rebuild the doc") {
    val text = "the quick brown fox jumps over the lazy dog"
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Chunking.charChunks(d, "text", "doc_id", size = 20, stride = 10)
      .orderBy("chunk_idx").collect()
    val rebuilt = rows.map(_.getString(3).take(10)).mkString
    // each chunk's first `stride` chars are disjoint and in order
    assert(rebuilt == text)
  }
}
