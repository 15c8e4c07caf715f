package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Temperature-weighted source mixing: fractions follow avail^alpha, cap at
  * 1, and the realized sample keeps exactly ceil(frac·n) docs per source.
  */
class MixingSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // big: 10 docs × 90 tokens = 900; small: 10 docs × 10 tokens = 100
  private val d = ((0L until 10L).map(i => (i, "big", 90L)) ++
    (10L until 20L).map(i => (i, "small", 10L))).toDF("doc_id", "source", "n_tok")

  test("alpha < 1 upsamples the tail source relative to its raw share") {
    val f = Mixing.fractions(d, "source", "n_tok", alpha = 0.5, budgetShare = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // sw = sqrt(900)+sqrt(100) = 40, budget = 500
    // big:   500*30/40/900 = 0.416667 ; small: 500*10/40/100 = 1.25 → cap 1.0
    assert(f("big") == 0.416667)
    assert(f("small") == 1.0)
    // raw share would keep 50% of small; temperature keeps ALL of it
  }

  test("alpha = 1 reduces to proportional sampling (every source same frac)") {
    val f = Mixing.fractions(d, "source", "n_tok", alpha = 1.0, budgetShare = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(f == Map("big" -> 0.5, "small" -> 0.5))
  }

  test("temperatureMix keeps exactly ceil(frac*n_docs) docs per source, deterministically") {
    val m1 = Mixing.temperatureMix(d, "source", "doc_id", "n_tok", 0.5, 0.5)
      .collect().map(r => r.getString(0) -> (r.getLong(4), r.getLong(5))).toMap
    // big: ceil(0.416667*10) = 5 docs → 450 tokens; small: all 10 → 100
    assert(m1 == Map("big" -> ((5L, 450L)), "small" -> ((10L, 100L))))
    val m2 = Mixing.temperatureMix(d, "source", "doc_id", "n_tok", 0.5, 0.5)
      .collect().map(r => r.getString(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(m1 == m2)
  }

  test("a source whose frac rounds to 0 still appears in the report with kept = 0") {
    // budgetShare 1e-7 at alpha 1 gives every source frac = 1e-7, which
    // rounds to 0.0 at 6 dp → ceil keeps nothing; the report must still
    // show both sources (kept_docs = 0), not silently drop them
    val m = Mixing.temperatureMix(d, "source", "doc_id", "n_tok", 1.0, 1e-7)
      .collect().map(r => r.getString(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(m == Map("big" -> ((0L, 0L)), "small" -> ((0L, 0L))))
  }

  test("input columns colliding with mix internals are rejected, not clobbered") {
    intercept[IllegalArgumentException](
      Mixing.temperatureMix(d.withColumn("frac", org.apache.spark.sql.functions.lit(1.0)),
        "source", "doc_id", "n_tok", 0.5, 0.5))
  }

  test("budgetShare bounds are enforced") {
    intercept[IllegalArgumentException](
      Mixing.fractions(d, "source", "n_tok", 0.5, 0.0))
    intercept[IllegalArgumentException](
      Mixing.fractions(d, "source", "n_tok", 0.5, 1.5))
  }
}
