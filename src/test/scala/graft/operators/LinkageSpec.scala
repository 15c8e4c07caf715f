package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Fellegi–Sunter scoring semantics: exact literal-weight sums in field
  * order, the two-threshold classification, and the guard rails.
  */
class LinkageSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val fields = Seq(
    Linkage.FieldSpec("word", col("w"), 6.5, -3.25),
    Linkage.FieldSpec("len", col("l"), 2.4, -3.7),
    Linkage.FieldSpec("prefix", col("p"), 8.6, -2.3))

  private def link(rows: Seq[(Long, Boolean, Boolean, Boolean)]) =
    Linkage.fellegiSunter(rows.toDF("id", "w", "l", "p"), fields,
      matchThreshold = 4.0, possibleThreshold = -4.0)
      .select("id", "score", "cls", "agree_word", "agree_len", "agree_prefix")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getString(2)))).toMap

  test("score is the exact fixed-order sum of the literal weights") {
    val got = link(Seq(
      (1L, true, true, true),    // 6.5 + 2.4 + 8.6
      (2L, false, true, false),  // -3.25 + 2.4 - 2.3
      (3L, false, false, false), // -3.25 - 3.7 - 2.3
      (4L, true, false, true)))  // 6.5 - 3.7 + 8.6
    assert(got(1L) == ((BigDecimal(6.5 + 2.4 + 8.6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, "match")))
    assert(got(2L)._2 == "possible" &&
      math.abs(got(2L)._1 - (-3.15)) < 1e-9)
    assert(got(3L) == ((-9.25, "non_match")))
    assert(got(4L)._2 == "match" && math.abs(got(4L)._1 - 11.4) < 1e-9)
  }

  test("thresholds are inclusive: score == threshold classifies upward") {
    val f = Seq(Linkage.FieldSpec("x", col("w"), 4.0, -4.0))
    val got = Linkage.fellegiSunter(
      Seq((1L, true), (2L, false)).toDF("id", "w"), f, 4.0, -4.0)
      .select("id", "cls").collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(got(1L) == "match")     // 4.0 >= 4.0
    assert(got(2L) == "possible")  // -4.0 >= -4.0
  }

  test("misconfiguration is rejected eagerly") {
    val df = Seq((1L, true)).toDF("id", "w")
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(df, Seq.empty, 4.0, -4.0)
    }
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(df,
        Seq(Linkage.FieldSpec("x", col("w"), 1.0, -1.0)), -4.0, 4.0)
    }
  }

  test("scoring adds no shuffle: the plan over a candidate frame is map-only") {
    val df = Seq((1L, true, false, true)).toDF("id", "w", "l", "p")
    val plan = Linkage.fellegiSunter(df, fields, 4.0, -4.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
