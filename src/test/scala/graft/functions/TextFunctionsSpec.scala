package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TextFunctionsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).collect().head.getAs[T]("v")

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): Seq[String] =
    Seq(text).toDF("t").select(c.as("v")).collect().head.getSeq[String](0).toSeq

  test("tokens lower-cases, splits on any whitespace, drops empties") {
    val toks = oneSeq(TextFunctions.tokens(col("t")), "  The  QUICK\tbrown\n fox ")
    assert(toks == Seq("the", "quick", "brown", "fox"))
  }

  test("shingles builds n-grams; short docs collapse to one shingle") {
    val sh = oneSeq(TextFunctions.shingles(TextFunctions.tokens(col("t")), 3), "a b c d")
    assert(sh == Seq("a b c", "b c d"))
    val short = oneSeq(TextFunctions.shingles(TextFunctions.tokens(col("t")), 3), "a b")
    assert(short == Seq("a b"))
  }

  test("minhash signature: equal inputs agree, length = perms, stable across rows") {
    val df = Seq("x y z w", "x y z w", "totally different words here").toDF("t")
    val sigs = df.select(TextFunctions.minHashSignature(
      TextFunctions.tokens(col("t")), 16).as("s")).collect().map(_.getSeq[Long](0))
    assert(sigs(0).length == 16)
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("simhash: identical texts collide, different texts differ") {
    val df = Seq("alpha beta gamma delta", "alpha beta gamma delta", "omicron pi rho sigma").toDF("t")
    val sigs = df.select(TextFunctions.simHash64(TextFunctions.tokens(col("t"))).as("s"))
      .collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("hamming64 counts differing bits") {
    val df = Seq((0L, 0L), (0L, -1L), (5L, 1L)).toDF("a", "b")
    val h = df.select(TextFunctions.hamming64(col("a"), col("b")).cast("int").as("h"))
      .collect().map(_.getInt(0)).toSeq
    assert(h == Seq(0, 64, 1))
  }

  test("fingerprint is whitespace-insensitive but order-sensitive") {
    val df = Seq("a  b   c", "a b c", "c b a").toDF("t")
    val fps = df.select(TextFunctions.fingerprint(TextFunctions.tokens(col("t"))).as("f"))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("quality features golden values") {
    val row = Seq("the cat the cat runs").toDF("t")
      .select(TextFunctions.qualityFeatures(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getAs[Long]("n_tokens") == 5)
    assert(row.getAs[Long]("n_distinct") == 3)
    assert(row.getAs[Double]("avg_token_len") == 3.2) // (3+3+3+3+4)/5
    assert(row.getAs[Double]("stopword_ratio") == 0.4) // "the" twice
    assert(row.getAs[Double]("distinct_ratio") == 0.6)
  }

  test("langId picks the language with most marker hits, 'und' when none") {
    val cases = Seq(
      "the cat and the dog is here" -> "en",
      "der hund und die katze" -> "de",
      "le chat et la maison" -> "fr",
      "zzz qqq www" -> "und")
    cases.foreach { case (text, expected) =>
      assert(one[String](TextFunctions.langId(col("t")), text) == expected, text)
    }
  }

  test("bpePreTokens splits letter/digit/punct runs exactly (golden values)") {
    val f = TextFunctions.bpePreTokens(col("t"))
    // mixed classes: letters, digits, punctuation runs split at boundaries
    assert(oneSeq(f, "ab12, cd") == Seq("ab", "12", ",", "cd"))
    assert(oneSeq(f, "GPT-4o costs $0.01!") ==
      Seq("gpt", "-", "4", "o", "costs", "$", "0", ".", "01", "!"))
    // consecutive punctuation is ONE run; all whitespace kinds separate
    assert(oneSeq(f, "a...b\tc\nd\re\ff") == Seq("a", "...", "b", "c", "d", "e", "f"))
    assert(oneSeq(f, "   ") == Seq.empty)
    assert(oneSeq(f, "") == Seq.empty)
  }

  test("charNgramSetFast yields the same gram SET as the HOF charNgramSet") {
    import spark.implicits._
    val texts = Seq(
      "The quick brown Fox jumps over the lazy dog",
      "aaaaaa", "ab", "abc", "", "  spaced   out  ",
      "Füße größer — naïve café", // non-ASCII lowercasing + multibyte windows
      "ψυχή και σώμα", "日本語のテキストです")
    val df = texts.toDF("t")
    val rows = df.select(
      TextFunctions.charNgramSet(col("t"), 3).as("hof"),
      TextFunctions.charNgramSetFast(col("t"), 3).as("fused")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[String](0).toSet == r.getSeq[String](1).toSet, s"mismatch for '$t'")
    }
    // null passes through as null on both paths
    val nulls = Seq(null.asInstanceOf[String]).toDF("t").select(
      TextFunctions.charNgramSet(col("t"), 3).as("hof"),
      TextFunctions.charNgramSetFast(col("t"), 3).as("fused")).collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("wordBigrams: n-1 bigrams, EMPTY below 2 tokens (no whole-doc shingle)") {
    val f = TextFunctions.wordBigrams(TextFunctions.tokens(col("t")))
    assert(oneSeq(f, "a b c a b") == Seq("a b", "b c", "c a", "a b"))
    assert(oneSeq(f, "solo") == Seq.empty)   // shingles() would yield ["solo"]
    assert(oneSeq(f, "") == Seq.empty)
  }

  test("wordShinglesFast agrees element-for-element with strictShingles∘tokens") {
    val texts = Seq(
      "a b c a b", "one  two\tthree\nfour", "  leading and trailing  ",
      "solo", "", "UPPER Case MiXeD tokens here now",
      "Füße größer — naïve café words appended", "ab\fc\rd")
    val df = texts.toDF("t")
    for (n <- Seq(2, 4)) {
      val rows = df.select(
        TextFunctions.strictShingles(TextFunctions.tokens(col("t")), n).as("hof"),
        TextFunctions.wordShinglesFast(col("t"), n).as("fused")).collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n mismatch for '$t'")
      }
    }
    val nulls = Seq(null.asInstanceOf[String]).toDF("t").select(
      TextFunctions.wordShinglesFast(col("t"), 2)).collect()(0)
    assert(nulls.isNullAt(0))
  }

  test("wordShingleSetFast is the distinct set of the multiplicity form") {
    val texts = Seq("a b a b a b", "x y z x y", "short", "")
    val rows = texts.toDF("t").select(
      TextFunctions.wordShingleSetFast(col("t"), 2).as("set"),
      TextFunctions.wordShinglesFast(col("t"), 2).as("all")).collect()
    rows.foreach { r =>
      val set = r.getSeq[String](0)
      assert(set.toSet == r.getSeq[String](1).toSet)
      assert(set.distinct == set, "set form must not repeat elements")
    }
  }

  test("charEntropy: uniform alphabet → log2(k); repeats → 0; empty → 0; null → null") {
    val rows = Seq("abcd", "aaaa", "", "aabb", null)
      .toDF("t").select(TextFunctions.charEntropy(col("t")).as("h")).collect()
    assert(rows(0).getDouble(0) == 2.0)  // 4 equiprobable chars
    assert(rows(1).getDouble(0) == 0.0)  // single symbol (and not -0.0)
    assert(rows(2).getDouble(0) == 0.0)
    assert(rows(3).getDouble(0) == 1.0)  // two equiprobable symbols
    assert(rows(4).isNullAt(0))
  }

  test("charEntropy matches a JVM reference on mixed text") {
    val texts = Seq("the quick brown fox", "mississippi", "a b a b")
    val got = texts.toDF("t")
      .select(TextFunctions.charEntropy(col("t")).as("h")).collect().map(_.getDouble(0))
    texts.zip(got).foreach { case (t, h) =>
      val n = t.length.toDouble
      val expect = -t.groupBy(identity).values
        .map(g => g.length / n * (math.log(g.length / n) / math.log(2.0))).sum
      assert(math.abs(h - BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, t)
    }
  }

  test("charEntropyStats fused path equals the HOF form bit-for-bit") {
    val texts = Seq("the quick brown fox jumps over the lazy dog", "mississippi",
      "a", "ab", "aabbccddeeff gg hh", "", "x y z x y z x", "1234567890 !?.,;")
    val rows = texts.toDF("t").select(
      TextFunctions.charEntropy(col("t")).as("hof"),
      TextFunctions.charEntropyStats(col("t")).as("st")).collect()
    texts.zip(rows).foreach { case (t, r) =>
      assert(r.getDouble(0) == r.getStruct(1).getDouble(1), s"entropy mismatch for '$t'")
      assert(r.getStruct(1).getLong(0) == t.distinct.length.toLong, s"n_distinct for '$t'")
    }
    // null text → null struct, matching the HOF's null
    val nr = Seq[String](null).toDF("t")
      .select(TextFunctions.charEntropyStats(col("t"))).collect().head
    assert(nr.isNullAt(0))
  }

  test("bigramStats matches the exploded groupBy computation") {
    val texts = Seq("a b a b a b c", "one two three", "w w w w w", "solo", "")
    val rows = texts.toDF("t").select(TextFunctions.bigramStats(col("t")).as("st")).collect()
    texts.zip(rows).foreach { case (t, r) =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 2) assert(r.isNullAt(0), s"'$t' has no bigram — must be null")
      else {
        val bgs = toks.sliding(2).map(_.mkString(" ")).toSeq
        val counts = bgs.groupBy(identity).map(_._2.size)
        val st = r.getStruct(0)
        assert(st.getLong(0) == bgs.size.toLong, s"n_bigrams for '$t'")
        assert(st.getLong(1) == counts.size.toLong, s"n_distinct for '$t'")
        assert(st.getLong(2) == counts.max.toLong, s"top for '$t'")
      }
    }
  }
}
