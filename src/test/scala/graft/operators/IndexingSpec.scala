package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class IndexingSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the dog sat"),
    (3L, "the cat ran"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("invertedIndex: exact df, sorted postings, per-doc distinct terms") {
    val idx = Indexing.invertedIndex(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2)))
      .toMap
    assert(idx("the") == (3L, Seq(1L, 2L, 3L)))
    assert(idx("cat") == (2L, Seq(1L, 3L)))
    assert(idx("sat") == (2L, Seq(1L, 2L)))
    assert(idx("dog") == (1L, Seq(2L)))
    assert(idx.size == 5) // the cat sat dog ran — nothing from the empty doc
  }

  test("invertedIndex: duplicate tokens within one doc index once") {
    val d = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val idx = Indexing.invertedIndex(d, "text", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idx == Map("a" -> 1L, "b" -> 1L))
  }

  test("invertedIndex: cap bounds postings but df stays the exact count") {
    val d = (1L to 10L).map(i => (i, "hot term")).toDF("doc_id", "text")
    val idx = Indexing.invertedIndex(d, "text", "doc_id", cap = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2)))
      .toMap
    assert(idx("hot") == (10L, Seq(1L, 2L, 3L))) // df uncapped, postings capped+sorted
  }

  test("bigramPmi: counts and PMI match hand computation") {
    // corpus: "a b" ×3, "a c" ×1 → unigrams a:4 b:3 c:1... build it exactly:
    val d = Seq("a b", "a b", "a b", "a c").toDF("text")
    val got = Indexing.bigramPmi(d, "text", minCount = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // bigrams: "a b"×3, "a c"×1 → only "a b" survives minCount=3.
    // n_uni=8, n_bi=4, c(a)=4, c(b)=3 → pmi = ln((3/4)/((4/8)*(3/8)))
    assert(got.length == 1)
    val (bg, c12, pmi) = got.head
    assert(bg == "a b" && c12 == 3L)
    val expected = math.log((3.0 / 4.0) / ((4.0 / 8.0) * (3.0 / 8.0)))
    assert(math.abs(pmi - expected) < 1e-6)
  }

  test("bigramPmi: single-token and empty docs contribute no bigrams") {
    val d = Seq("solo", "", "x y").toDF("text")
    val got = Indexing.bigramPmi(d, "text", minCount = 1L).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("x y"))
  }
}
