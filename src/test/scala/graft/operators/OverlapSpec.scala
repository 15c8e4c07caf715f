package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class OverlapSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // srcA and srcB share the 3-gram "a b c" (srcA has it twice — multiplicity
  // must not inflate the count); srcC shares nothing.
  private val docs = Seq(
    (0L, "a b c d", "srcA"),
    (1L, "x a b c", "srcA"),
    (2L, "a b c e", "srcB"),
    (3L, "p q r s", "srcC"))
    .toDF("doc_id", "text", "source")

  test("shared distinct grams and Jaccard per pair; disjoint pairs absent") {
    val out = Overlap.sourceShingleOverlap(docs, "text", "source", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // srcA grams: {a b c, b c d, x a b} (2 docs, "a b c" deduped) → 3
    // srcB grams: {a b c, b c e} → 2; shared = 1 → J = 1/(3+2-1) = 0.25
    assert(out.keySet == Set(("srcA", "srcB"))) // srcC pairs have 0 shared
    assert(out(("srcA", "srcB")) == ((1L, 0.25)))
  }

  test("pair orientation is deterministic (src_a < src_b) and symmetric input-safe") {
    val flipped = Overlap.sourceShingleOverlap(
      docs.orderBy($"doc_id".desc), "text", "source", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(flipped == Set(("srcA", "srcB")))
  }

  test("n larger than every document yields no pairs") {
    assert(Overlap.sourceShingleOverlap(docs, "text", "source", n = 9).isEmpty)
  }

  test("ngramNovelty: first doc is fully novel, an exact copy is fully stale") {
    val corpus = Seq(
      (0L, "a b c d"),        // grams: {a b c, b c d} — all first-seen
      (1L, "a b c d"),        // exact copy → novelty 0
      (2L, "a b c x y z"))    // {a b c, b c x, c x y, x y z}: 3 of 4 novel
      .toDF("doc_id", "text")
    val out = Overlap.ngramNovelty(corpus, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0L) == ((2L, 2L, 1.0)))
    assert(out(1L) == ((2L, 0L, 0.0)))
    assert(out(2L) == ((4L, 3L, 0.75)))
  }

  test("ngramNovelty: per-corpus novel counts sum to the distinct gram total") {
    val corpus = (0L until 20L).map(i => (i, s"w${i % 4} w${(i + 1) % 5} w${(i + 2) % 3} end"))
      .toDF("doc_id", "text")
    val out = Overlap.ngramNovelty(corpus, "text", "doc_id", n = 3)
    val novelSum = out.agg(sum("n_novel")).collect().head.getLong(0)
    val distinctGrams = corpus.select(explode(
      graft.functions.TextFunctions.wordShingleSetFast(col("text"), 3)).as("g"))
      .select("g").distinct().count()
    assert(novelSum == distinctGrams) // every distinct gram is novel exactly once
  }
}
