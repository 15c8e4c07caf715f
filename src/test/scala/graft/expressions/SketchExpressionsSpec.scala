package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.TextFunctions

/** The one-pass sketch expressions must agree bit-for-bit with the composed
  * higher-order-function forms they replaced.
  */
class SketchExpressionsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "completely different content entirely",
    "a", // single token
    "x y z x y z x y z").toDF("t")

  test("simhash_bits equals the 64-pass HOF form") {
    val rows = texts.select(
      TextFunctions.simHash64(TextFunctions.tokens(col("t"))).as("fast"),
      TextFunctions.simHash64Hof(TextFunctions.tokens(col("t"))).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("fused text-to-signature UDFs equal the composed column forms") {
    val rows = texts.select(
      TextFunctions.minHashFromText(col("t"), 3, 32).as("mh_fused"),
      TextFunctions.minHashSignature(
        TextFunctions.shingles(TextFunctions.tokens(col("t")), 3), 32).as("mh_col"),
      TextFunctions.simHashFromText(col("t")).as("sh_fused"),
      TextFunctions.simHash64(TextFunctions.tokens(col("t"))).as("sh_col")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("minhash_sig equals the num-pass HOF form for several sizes") {
    Seq(4, 16, 64).foreach { num =>
      val rows = texts.select(
        TextFunctions.minHashSignature(
          TextFunctions.shingles(TextFunctions.tokens(col("t")), 3), num).as("fast"),
        TextFunctions.minHashSignatureHof(
          TextFunctions.shingles(TextFunctions.tokens(col("t")), 3), num).as("ref")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"num=$num")
      }
    }
  }

  test("sig_agreement equals the zip_with/filter/size HOF form") {
    // cross all pairs of signatures (incl. self-pairs → agreement = perms)
    val sigs = texts.select(TextFunctions.minHashFromText(col("t"), 3, 32).as("sig"))
    val pairs = sigs.crossJoin(sigs.select(col("sig").as("sig2")))
    val rows = pairs.select(
      TextFunctions.sigAgreement(col("sig"), col("sig2")).as("fast"),
      TextFunctions.sigAgreementHof(col("sig"), col("sig2")).as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // registered SQL surface + null propagation
    graft.GraftFunctions.register(spark)
    val sql = spark.sql(
      "SELECT sig_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS a, " +
        "sig_agreement(NULL, array(1L)) AS n")
      .collect().head
    assert(sql.getInt(0) == 2 && sql.isNullAt(1))
  }
}
