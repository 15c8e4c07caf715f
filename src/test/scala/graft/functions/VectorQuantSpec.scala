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

  test("tiny-magnitude band: scale rounding is material — codes clamp to [-127, 127]") {
    // max|x| = 1.78e-4 → raw scale 1.4015...e-6 rounds to 1e-6; the raw
    // code floor(1.78e-4/1e-6 + 0.5) = 178 would escape int8 without the
    // clamp. The reported error must be the CLAMPED code's error.
    val Array((scale, codes, err)) = quantize(Seq(Seq(1.78e-4, -1.78e-4, 2e-7)))
    assert(scale == 1e-6)
    assert(codes == Seq(127, -127, 0))
    assert(err > 0) // |1.78e-4 − 127e-6| = 5.1e-5, visible at 6 dp
    assert(math.abs(err - 5.1e-5) < 1e-9)
  }

  test("sub-underflow band: nonzero vector whose rounded scale would be 0 " +
    "falls back to the unrounded scale instead of zeroing the vector") {
    // max|x| = 4e-5 → max/127 = 3.15e-7 rounds to 0 at 6 dp; the fallback
    // keeps the exact division so the vector still quantizes faithfully.
    val Array((scale, codes, err)) = quantize(Seq(Seq(4e-5, -2e-5)))
    assert(scale > 0 && scale == 4e-5 / 127d)
    assert(codes.head == 127)
    assert(codes(1) == math.floor(-2e-5 / scale + 0.5).toInt)
    assert(err <= scale / 2 + 1e-12)
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
