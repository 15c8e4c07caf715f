package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class VectorQuantSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def quantize(vs: Seq[Seq[Double]]) = {
    vs.toDF("v")
      .withColumn("scale", VectorFunctions.int8Scale(col("v")))
      .select(
        col("scale"),
        VectorFunctions.int8Codes(col("v"), col("scale")).as("codes"),
        VectorFunctions.int8MaxError(col("v"), col("scale")).as("err"))
      .collect()
      .map(r => (r.getDouble(0), r.getSeq[Int](1), r.getDouble(2)))
  }

  test("extreme components map to ±127, zero to 0") {
    val Array((scale, codes, _)) = quantize(Seq(Seq(1.27, -1.27, 0.0)))
    assert(scale == 0.01)
    assert(codes == Seq(127, -127, 0))
  }

  test("codes stay within [-127, 127] and error within scale/2 on arbitrary vectors") {
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(50)(Seq.fill(16)(rnd.nextDouble() * 8 - 4))
    quantize(vecs).foreach { case (scale, codes, err) =>
      assert(codes.forall(c => c >= -127 && c <= 127))
      // half-step bound, plus dust from the 6-dp scale rounding
      assert(err <= scale / 2 + 1e-4)
    }
  }

  test("zero vector: zero scale, all-zero codes, zero error") {
    val Array((scale, codes, err)) = quantize(Seq(Seq(0.0, 0.0, 0.0)))
    assert(scale == 0.0 && err == 0.0)
    assert(codes == Seq(0, 0, 0))
  }

  test("reconstruction beats 1% relative error on unit-norm-ish vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(20)(Seq.fill(32)(rnd.nextGaussian() * 0.2))
    quantize(vecs).foreach { case (scale, _, err) =>
      // max|x| = 127·scale (pre-rounding): err/max|x| ≤ 1/254 < 1%
      if (scale > 0) assert(err / (127 * scale) < 0.01)
    }
  }
}
