package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Seeded randomized sweeps for the two joins that claim LOSSLESSNESS
  * (offline cache has no scalatest-scalacheck bridge — same deterministic
  * convention as KernelsSpec): random corpora with planted near-dups,
  * compared EXACTLY against the brute-force shape they replace. A prune
  * bound that's off by one anywhere shows up here as a missing pair.
  */
class DedupFuzzSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    val base = (0 until nDocs).map { i =>
      (4 + rnd.nextInt(24)) -> Vector.fill(4 + rnd.nextInt(24))(vocab(rnd.nextInt(vocab.size)))
    }.map(_._2)
    base.zipWithIndex.map { case (words, i) =>
      // every third doc mutates an earlier one: drop/substitute a word or
      // append — the near-dup population the thresholds actually bite on
      val text =
        if (i % 3 == 2 && i > 0) {
          val src = base(rnd.nextInt(i)).toBuffer
          rnd.nextInt(3) match {
            case 0 if src.length > 1 => src.remove(rnd.nextInt(src.length)): Unit
            case 1 => src(rnd.nextInt(src.length)) = vocab(rnd.nextInt(vocab.size))
            case _ => src.append(vocab(rnd.nextInt(vocab.size))): Unit
          }
          src.mkString(" ")
        } else words.mkString(" ")
      (i.toLong, text)
    }
  }

  test("setSimilarityJoin == brute force on seeded random corpora (thresholds 0.5 / 0.8)") {
    for (seed <- 1L to 6L; t <- Seq(0.5, 0.8)) {
      val docs = corpus(seed, 24).toDF("doc_id", "text")
      val fast = Dedup.setSimilarityJoin(docs, "text", "doc_id", n = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val brute = Dedup.ngramWordJaccardBrute(docs, "text", "doc_id", n = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast == brute, s"seed=$seed t=$t: prefix join diverged from brute force")
    }
    // the sweep must actually exercise pairs somewhere or it proves nothing
    val any = (1L to 6L).exists { seed =>
      Dedup.setSimilarityJoin(corpus(seed, 24).toDF("doc_id", "text"),
        "text", "doc_id", n = 3, threshold = 0.5).limit(1).count() > 0
    }
    assert(any, "no seed produced a single qualifying pair — generator broken")
  }

  test("setSimilarityJoin == brute force on one larger corpus (150 docs, heavier mutation mix)") {
    val docs = corpus(99L, 150).toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.8)) {
      val fast = Dedup.setSimilarityJoin(docs, "text", "doc_id", n = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val brute = Dedup.ngramWordJaccardBrute(docs, "text", "doc_id", n = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast == brute, s"150-doc corpus, t=$t: prefix join diverged")
      assert(fast.nonEmpty)
    }
  }

  test("editDistancePairs == unbucketed cross join on seeded random corpora (maxDist 2 / 6)") {
    for (seed <- 11L to 14L; maxDist <- Seq(2, 6)) {
      val docs = corpus(seed, 20).toDF("doc_id", "text")
      val fast = Dedup.editDistancePairs(docs, "text", "doc_id", maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the pre-round-6 shape: plan-level cross join, band as residual
      val t = docs.select(col("doc_id").as("id"), col("text").as("t"))
      val brute = t.select(col("id").as("doc_a"), col("t").as("t_a"))
        .crossJoin(t.select(col("id").as("doc_b"), col("t").as("t_b")))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("dist", levenshtein(col("t_a"), col("t_b"), maxDist).cast("long"))
        .filter(col("dist") >= 0)
        .select("doc_a", "doc_b", "dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast == brute, s"seed=$seed maxDist=$maxDist: bucketed join diverged")
    }
  }
}
