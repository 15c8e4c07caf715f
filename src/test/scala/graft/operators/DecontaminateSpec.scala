package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Decontamination: exact n-gram containment against an eval set — clean
  * and too-short documents never surface, counts are distinct-based.
  */
class DecontaminateSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val evalSet = Seq(
    (100L, "alpha beta gamma delta epsilon"),
    (101L, "one two three four five six")).toDF("doc_id", "text")

  private val corpus = Seq(
    // shares "beta gamma delta epsilon" with eval 100
    (1L, "xx beta gamma delta epsilon yy"),
    // shares shingles with BOTH eval docs
    (2L, "alpha beta gamma delta zz one two three four"),
    // no 4-gram overlap (words overlap, order differs)
    (3L, "epsilon delta gamma beta alpha"),
    // shorter than 4 tokens: contains no 4-gram at all
    (4L, "beta gamma delta")).toDF("doc_id", "text")

  test("flags exactly the documents sharing a 4-token shingle, with distinct counts") {
    val got = Decontaminate.overlaps(corpus, evalSet, "text", "doc_id", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: one eval doc, one shared shingle ("beta gamma delta epsilon")
    // doc 2: two eval docs, 2 shingles ("alpha beta gamma delta", "one two three four")
    assert(got == Map(1L -> ((1L, 1L)), 2L -> ((2L, 2L))))
  }

  test("a repeated shingle inside one document counts once (distinct explode)") {
    val rep = Seq((9L, "one two three four one two three four")).toDF("doc_id", "text")
    val got = Decontaminate.overlaps(rep, evalSet, "text", "doc_id", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((9L, 1L, 1L)))
  }

  test("contaminationFraction grades every corpus doc, clean ones at 0.0") {
    val got = Decontaminate.contaminationFraction(corpus, evalSet, "text", "doc_id", n = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // doc 1: 3 distinct shingles, 1 contaminated → 1/3
    assert(got(1L) == ((3L, 1L, 0.333333)))
    // doc 2: 6 shingles, 2 contaminated → 1/3
    assert(got(2L) == ((6L, 2L, 0.333333)))
    // doc 3: 2 shingles, none contaminated → present at 0.0
    assert(got(3L) == ((2L, 0L, 0.0)))
    // doc 4: no 4-gram at all → 0 of 0 windows, emitted as 0.0
    assert(got(4L) == ((0L, 0L, 0.0)))
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }
}
