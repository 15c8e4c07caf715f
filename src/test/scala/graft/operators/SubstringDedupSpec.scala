package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Duplicated-substring spans: a long verbatim run shared by two documents
  * surfaces even when the copies sit at different offsets (the point of
  * content-based sampling), unique text never pairs, and short documents
  * have no windows at all.
  */
class SubstringDedupSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // 120 chars of boilerplate — long enough that a 1/16 content sample of
  // 64-char windows hits it with near-certainty (57 window starts).
  private val boiler =
    "This material is licensed under the Creative Commons Attribution license " +
      "and may be redistributed with attribution only."

  private def uniq(seed: Int): String =
    (0 until 12).map(i => s"unique${seed}word$i").mkString(" ")

  test("a shared long run is found at DIFFERENT offsets in each doc") {
    val docs = Seq(
      (1L, uniq(1) + " " + boiler),            // copy at one offset
      (2L, boiler + " " + uniq(2)),            // copy at offset 1
      (3L, uniq(3) + " " + uniq(4))            // no copy
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(spans.nonEmpty, "sampled windows of the shared run must collide")
    assert(spans.map(_._1).toSet == Set(1L, 2L), "only the two copies pair")
    assert(spans.forall(_._4 == 2L))
    // the same window hash appears in both docs at DIFFERENT positions
    val byHash = spans.groupBy(_._3)
    assert(byHash.values.exists { g =>
      g.map(_._1).toSet == Set(1L, 2L) && g.map(_._2).distinct.length == 2
    }, "position independence: same content, different offsets")
  }

  test("position is the 1-based window start within its own document") {
    val docs = Seq((1L, boiler), (2L, boiler)).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(spans.nonEmpty)
    // identical docs → identical (pos, hash) sets
    val p1 = spans.filter(_._1 == 1L).map(s => (s._2, s._3)).toSet
    val p2 = spans.filter(_._1 == 2L).map(s => (s._2, s._3)).toSet
    assert(p1 == p2 && p1.forall(p => p._1 >= 1 && p._1 <= boiler.length - 63))
  }

  test("unique documents and sub-window documents produce nothing") {
    val docs = Seq(
      (1L, uniq(10) + " " + uniq(11)),
      (2L, uniq(12) + " " + uniq(13)),
      (3L, "too short for any 64-char window")
    ).toDF("doc_id", "text")
    assert(SubstringDedup.duplicatedSpans(docs, "text", "doc_id").isEmpty)
  }

  test("samplingRecallAudit: runs collapse to maximal islands with correct detect flags") {
    // doc1/doc2 share boiler at different offsets → ONE maximal run each;
    // the run is 57 windows, so det_1_16 must be 1 with near-certainty is
    // NOT what we assert — the flag is deterministic for this text, so pin
    // whatever md5 says, and pin the island geometry exactly
    val docs = Seq(
      (1L, uniq(1) + " " + boiler),
      (2L, boiler + " " + uniq(2)),
      (3L, uniq(3) + " " + uniq(4))).toDF("doc_id", "text")
    val runs = SubstringDedup.samplingRecallAudit(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(runs.map(_._1).sorted.toSeq == Seq(1L, 2L), "one maximal run per copy")
    val Seq(r1, r2) = runs.sortBy(_._1).toSeq
    assert(r1._3 == r2._3, "both copies hold the same run length")
    assert(r1._4 == r1._3 + 63, "run_chars = windows + window - 1")
    // offsets differ but geometry matches: doc2's copy starts at pos 1
    assert(r2._2 == 1L && r1._2 > 1L)
    // detection flags are content-based → identical across the two copies
    assert(r1._5 == r2._5 && r1._6 == r2._6)
    // coarser sampling can only lose runs, never gain them
    assert(r1._6 <= r1._5)
  }

  test("samplingRecallAudit floor on the fixture corpus: 1/16 catches every run, 1/256 visibly erodes") {
    // sf0.001 documents: 43 maximal duplicated runs; md5 is deterministic,
    // so these are exact pins, not statistical floors. The 1/256 dial
    // must sit strictly between 0 and n_runs — both audit branches live.
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val runs = SubstringDedup.samplingRecallAudit(docs, "text", "doc_id")
      .groupBy().agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("det_1_16").as("d16"),
        org.apache.spark.sql.functions.sum("det_1_256").as("d256"))
      .collect().head
    assert(runs.getLong(0) == 43L, s"expected 43 maximal runs, got ${runs.getLong(0)}")
    assert(runs.getLong(1) == 43L, "the production 1/16 dial catches every fixture run")
    val d256 = runs.getLong(2)
    assert(d256 > 0L && d256 < 43L, s"1/256 must be lossy-but-alive, got $d256")
  }

  test("duplicatedCoverage: char-interval union, zero-coverage docs included") {
    // docA/docB share two runs (P and Q) separated by DIFFERENT 1-char
    // middles, so the windows crossing the middle are unique to each doc:
    // coverage must report two disjoint islands whose char union excludes
    // exactly the substituted position — and doc 3 reports 0.0, present.
    val p = "P" + boiler // 121 chars of shared prefix run
    val q = boiler.reverse + "Q" // 121 chars of shared suffix run
    val docs = Seq(
      (1L, p + "x" + q),
      (2L, p + "y" + q),
      (3L, uniq(20) + " " + uniq(21))).toDF("doc_id", "text")
    val cov = SubstringDedup.duplicatedCoverage(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val total = (p + "x" + q).length.toLong
    assert(cov(3L) == ((docs.filter($"doc_id" === 3L).head.getString(1).length.toLong, 0L, 0L, 0.0)))
    for (id <- Seq(1L, 2L)) {
      val (nChars, nIslands, dupChars, frac) = cov(id)
      assert(nChars == total)
      assert(nIslands == 2L, s"doc $id: P and Q must stay disjoint islands")
      // union covers everything except the single substituted middle char
      assert(dupChars == total - 1, s"doc $id: got $dupChars of $total")
      assert(math.abs(frac - (total - 1).toDouble / total) < 1e-6)
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  test("spanRemoval: the lowest-doc_id copy survives, the other is excised") {
    val docs = Seq(
      (1L, uniq(1) + " " + boiler), // canonical copy (min doc_id)
      (2L, boiler + " " + uniq(2)), // loses its boiler span
      (3L, uniq(3) + " " + uniq(4)) // untouched
    ).toDF("doc_id", "text")
    val out = SubstringDedup.spanRemoval(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    // doc 1 (canonical) and doc 3 (unique) keep their full text
    val d1 = uniq(1) + " " + boiler
    val d3 = uniq(3) + " " + uniq(4)
    assert(out(1L) == ((d1.length.toLong, 0L, 0L, d1.length.toLong, md5hex(d1))))
    assert(out(3L) == ((d3.length.toLong, 0L, 0L, d3.length.toLong, md5hex(d3))))
    // doc 2: the shared-window island is exactly the boiler occupancy
    // [1, boiler.length]; the rebuilt text is what follows it
    val d2 = boiler + " " + uniq(2)
    val expect2 = " " + uniq(2)
    assert(out(2L) == ((d2.length.toLong, 1L, boiler.length.toLong,
      expect2.length.toLong, md5hex(expect2))), s"got ${out(2L)}")
  }

  test("spanRemoval: an exact duplicate document is cut to the empty string") {
    val docs = Seq((1L, boiler), (2L, boiler)).toDF("doc_id", "text")
    val out = SubstringDedup.spanRemoval(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(4), r.getString(5)))).toMap
    assert(out(1L) == ((0L, boiler.length.toLong, md5hex(boiler))))
    assert(out(2L) == ((1L, 0L, md5hex(""))), "the non-canonical copy empties")
  }

  test("spanRemoval: disjoint cut islands leave exactly the unshared middle") {
    // doc1/doc2 share runs P and Q around a substituted 1-char middle (the
    // duplicatedCoverage fixture): doc2 loses both islands and keeps ONLY
    // its middle char — the two-cut rebuild path, exercised end to end.
    val p = "P" + boiler
    val q = boiler.reverse + "Q"
    val docs = Seq(
      (1L, p + "x" + q),
      (2L, p + "y" + q)).toDF("doc_id", "text")
    val out = SubstringDedup.spanRemoval(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    val total = (p + "x" + q).length.toLong
    assert(out(1L) == ((0L, 0L, total, md5hex(p + "x" + q))))
    assert(out(2L) == ((2L, total - 1, 1L, md5hex("y"))), s"got ${out(2L)}")
  }

  test("spanRemoval: survivor policy is per-WINDOW-TEXT, not per-document") {
    // run A shared by docs {1,2}: doc 1 keeps it. run B shared by docs
    // {2,3}: doc 2 is B's canonical holder, so doc 2 keeps B while LOSING
    // A — one document on both sides of the policy at once.
    val runA = boiler
    val runB = boiler.toUpperCase
    val docs = Seq(
      (1L, runA + " " + uniq(1)),
      (2L, runA + " " + runB),
      (3L, uniq(3) + " " + runB)).toDF("doc_id", "text")
    val out = SubstringDedup.spanRemoval(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(5)))).toMap
    assert(out(1L)._1 == 0L, "doc 1 holds A canonically")
    // doc 2 loses the island of windows shared with doc 1 — the full common
    // PREFIX "A + separator space" (windows overhanging A's end still match
    // while both docs agree on the next chars) — but keeps B
    assert(out(2L) == ((1L, md5hex(runB))), s"got ${out(2L)}")
    // doc 3 loses the common-suffix island "space + B" and keeps its
    // unique prefix
    assert(out(3L) == ((1L, md5hex(uniq(3)))), s"got ${out(3L)}")
  }

  test("spanRemoval invariants on the sf0.001 corpus: arithmetic closed, drops live") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = SubstringDedup.spanRemoval(docs, "text", "doc_id").collect()
    assert(out.length == docs.count().toInt, "every document present")
    out.foreach { r =>
      assert(r.getLong(4) == r.getLong(1) - r.getLong(3),
        s"kept = n_chars - removed must hold for doc ${r.getLong(0)}")
    }
    val touched = out.count(_.getLong(2) > 0)
    assert(touched > 0, "the corpus's duplicated runs must drive live cuts")
    assert(touched < out.length, "clean documents must survive untouched")
  }

  test("spanRemoval under the production 1/16 sampled detector is a strict per-doc subset") {
    // content sampling only ever LOSES windows (a hash self-selects
    // everywhere or nowhere), so sampled cut intervals sit inside exact
    // ones: removed_chars_sampled <= removed_chars_exact doc by doc, docs
    // untouched by the exact pass stay untouched, and on this corpus the
    // sampled pass still cuts (the production path is live, not a no-op)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    def byDoc(hexPrefix: String) =
      SubstringDedup.spanRemoval(docs, "text", "doc_id", 64, hexPrefix)
        .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(5))).toMap
    val exact = byDoc("")
    val sampled = byDoc("0")
    assert(exact.keySet == sampled.keySet)
    exact.foreach { case (id, (removedExact, digestExact)) =>
      val (removedSampled, digestSampled) = sampled(id)
      assert(removedSampled <= removedExact, s"doc $id cut more under sampling")
      if (removedExact == 0L)
        assert(digestSampled == digestExact, s"doc $id: untouched must stay untouched")
    }
    val cutSampled = sampled.count(_._2._1 > 0)
    assert(cutSampled > 0, "the sampled production path must stay live")
    // containment at the POSITION level (stronger than the per-doc char
    // arithmetic above, and what makes ext123's "conservative subset"
    // claim literal): every removable (doc, pos) the sampled detector
    // surfaces is one the exact enumeration surfaces too, so after island
    // merging every sampled cut interval sits inside an exact cut interval
    def removablePositions(hexPrefix: String) = {
      val spans = SubstringDedup.duplicatedSpans(
        docs, "text", "doc_id", 64, hexPrefix)
      val keepers = spans.groupBy("h")
        .agg(org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.col("doc_id")).as("keep_doc"))
      spans.join(keepers, "h")
        .where(org.apache.spark.sql.functions.col("doc_id") =!=
          org.apache.spark.sql.functions.col("keep_doc"))
        .select("doc_id", "pos").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val posSampled = removablePositions("0")
    val posExact = removablePositions("")
    assert(posSampled.nonEmpty && posSampled.subsetOf(posExact),
      s"sampled removable positions escaped the exact set: ${posSampled -- posExact}")
  }

  test("spanRemoval fuzz: rebuilt text matches a JVM reference excision, multibyte included") {
    // seed-deterministic random corpora (DedupFuzzSpec convention — the
    // offline cache has no scalatest-scalacheck bridge): docs assembled
    // from unique filler plus PLANTED shared blocks at random offsets, a
    // multibyte alphabet in the mix so the 1-based CODE-POINT positions in
    // the operator, its islands, and Spark's substring all have to agree
    // beyond ASCII. Reference = direct JVM excision on code points.
    val w = 16
    def md5hexOf(s: String): String = md5hex(s)
    def referenceClean(docs: Seq[(Long, String)]): Map[Long, String] = {
      val wins = for {
        (id, t) <- docs
        cps = t.codePointCount(0, t.length)
        if cps >= w
        offs = graft.functions.TextFunctions.codePointOffsets(t)
        s <- 0 to cps - w
      } yield (id, s + 1, md5hexOf(t.substring(offs(s), offs(s + w))))
      val byHash = wins.groupBy(_._3)
      val keepDoc = byHash.collect {
        case (h, g) if g.map(_._1).distinct.size >= 2 => h -> g.map(_._1).min
      }
      val cutsByDoc = wins
        .filter { case (id, _, h) => keepDoc.get(h).exists(_ != id) }
        .groupBy(_._1)
        .map { case (id, g) =>
          val ps = g.map(_._2).distinct.sorted
          // islands: merge positions ≤ w-1 apart, cover [s, maxpos + w - 1]
          val islands = ps.foldLeft(Vector.empty[(Long, Long)]) {
            case (acc, p) if acc.nonEmpty && p - (acc.last._2 - w + 1) <= w - 1 =>
              acc.init :+ ((acc.last._1, p + w - 1))
            case (acc, p) => acc :+ ((p, p + w - 1))
          }
          id -> islands
        }
      docs.map { case (id, t) =>
        val offs = graft.functions.TextFunctions.codePointOffsets(t)
        val cps = t.codePointCount(0, t.length)
        val cleaned = cutsByDoc.get(id) match {
          case None => t
          case Some(islands) =>
            val sb = new StringBuilder
            var cur = 1L
            islands.foreach { case (s, e) =>
              sb.append(t.substring(offs((cur - 1).toInt), offs((s - 1).toInt)))
              cur = e + 1
            }
            sb.append(t.substring(offs((cur - 1).toInt), offs(cps)))
            sb.toString
        }
        id -> cleaned
      }.toMap
    }
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abc déñ中xyz ".toCharArray
      def rndText(n: Int) =
        (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val blocks = (0 until 4).map(_ => rndText(w + rnd.nextInt(20)))
      val docs = (0L until 12L).map { id =>
        val parts = (0 until 1 + rnd.nextInt(3)).map { _ =>
          if (rnd.nextBoolean()) blocks(rnd.nextInt(blocks.length))
          else rndText(10 + rnd.nextInt(30))
        }
        (id, parts.mkString(rndText(1 + rnd.nextInt(3))))
      }
      val expected = referenceClean(docs)
      import spark.implicits._
      val out = SubstringDedup.spanRemoval(docs.toDF("doc_id", "text"),
        "text", "doc_id", window = w)
        .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getString(5)))).toMap
      docs.foreach { case (id, _) =>
        val exp = expected(id)
        assert(out(id) == ((exp.codePointCount(0, exp.length).toLong, md5hexOf(exp))),
          s"seed=$seed doc=$id: got ${out(id)}, expected digest of <$exp>")
      }
    }
  }

  test("null text is skipped, not a crash or an all-null bucket") {
    val docs = Seq((1L, null: String), (2L, null: String), (3L, boiler))
      .toDF("doc_id", "text")
    assert(SubstringDedup.duplicatedSpans(docs, "text", "doc_id").isEmpty)
  }
}
