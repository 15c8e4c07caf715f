package graft.operators

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
}
