package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BPE training against the hand-computed merge sequence of the classic
  * low/lower/newest/widest corpus (Sennrich et al.'s running example, no
  * end-of-word marker), and the inference loop's agreement with training
  * segmentation.
  */
class BpeSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // occurrence counts: low×5, lower×2, newest×6, widest×3
  private def corpus = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")

  test("learns the hand-computed merge sequence with deterministic tie-breaks") {
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 5)
    val got = merges.map(m => (m.rank, m.left, m.right, m.pairCount))
    assert(got == Seq(
      (0, "e", "s", 9L),   // ties (e,s)/(s,t) at 9 → lex
      (1, "es", "t", 9L),
      (2, "l", "o", 7L),   // ties (l,o)/(o,w) at 7 → lex
      (3, "lo", "w", 7L),
      (4, "e", "w", 6L)))  // ties (e,w)/(n,e)/(w,est) at 6 → lex
  }

  test("training stops early when no pair remains") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(tiny, "text", numMerges = 10)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b")))
  }

  test("inference reproduces training-time segmentation") {
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 5)
    val rankOf = merges.map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.encodeWord("newest", rankOf).toSeq == Seq("n", "ew", "est"))
    assert(Bpe.encodeWord("widest", rankOf).toSeq == Seq("w", "i", "d", "est"))
    assert(Bpe.encodeWord("low", rankOf).toSeq == Seq("low"))
    assert(Bpe.encodeWord("lower", rankOf).toSeq == Seq("low", "e", "r"))
    // unseen word: merges apply where possible, tokens rejoin to the word
    val toks = Bpe.encodeWord("slowest", rankOf)
    assert(toks.mkString == "slowest")
    assert(toks.toSeq == Seq("s", "low", "est"))
  }

  test("zero merges tokenizes to characters; more merges never add tokens") {
    val none = Bpe.encodeWord("newest", Map.empty)
    assert(none.toSeq == Seq("n", "e", "w", "e", "s", "t"))
    val m3 = Bpe.trainMerges(corpus, "text", 3).map(m => (m.left, m.right) -> m.rank).toMap
    val m5 = Bpe.trainMerges(corpus, "text", 5).map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.encodeWord("newest", m5).length <= Bpe.encodeWord("newest", m3).length)
  }

  test("encodeStats: chars conserved, compression = chars per token") {
    val merges = Bpe.trainMerges(corpus, "text", 5)
    val got = Bpe.encodeStats(corpus, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 1: 5×"low", each one token of 3 chars
    assert(got(1L) == ((5L, 5L, 15L, 3.0)))
    // doc 3: 6×"newest" → (n, ew, est) = 3 tokens/word, 6 chars/word
    assert(got(3L) == ((6L, 18L, 36L, 2.0)))
  }

  test("null text keeps its row with null counts; real text gets real counts") {
    val docs = Seq((1L, null: String), (2L, "low")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(corpus, "text", 5)
    val rows = Bpe.encodeStats(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).isNullAt(1) && rows(1L).isNullAt(2) && rows(1L).isNullAt(4),
      "null text: counts and compression are null, the row survives")
    assert((rows(2L).getLong(1), rows(2L).getLong(2), rows(2L).getLong(3)) ==
      ((1L, 1L, 3L)))
    val toks = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(Bpe.tokensColumn(org.apache.spark.sql.functions.col("text"), merges))
      .collect()
    assert(toks.head.isNullAt(0), "tokensColumn(null text) is null, not empty")
  }

  test("supplementary characters stay one symbol end-to-end (code points, not UTF-16 units)") {
    val rankOf = Map.empty[(String, String), Int]
    val toks = Bpe.encodeWord("a😀b", rankOf) // a 😀 b
    assert(toks.toSeq == Seq("a", "😀", "b"),
      "the emoji must not split into surrogate halves")
    // chars are conserved as CODE POINTS through encodeStats
    val docs = Seq((1L, "😀😀")).toDF("doc_id", "text")
    val got = Bpe.encodeStats(docs, "text", "doc_id", Seq.empty)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(got == ((1L, 2L, 2L)), s"2 emoji = 1 pretoken, 2 tokens, 2 chars; got $got")
  }
}
