package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class OutliersSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("flags the planted extremes and only them, with the exact fences") {
    // group g: 1..9 plus a 1000-char wall and a 0-length fragment.
    val rows = ((1 to 9).map(v => ("g", v.toLong)) ++
      Seq(("g", 1000L), ("g", -50L)) ++
      (1 to 11).map(v => ("h", 100L))).toDF("source", "n_chars")
    val out = Outliers.tukeyFences(rows, "n_chars", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    // g sorted: -50,1..9,1000 (n=11): p25 = 2.5, p75 = 7.5, IQR = 5
    // fences: [-5, 15] → low: -50, high: 1000.
    assert(out("g") == ((11L, 1L, 1L, -5.0, 15.0)))
    // h is constant: IQR = 0, fences collapse to [100, 100], no outliers.
    assert(out("h") == ((11L, 0L, 0L, 100.0, 100.0)))
  }

  test("k widens the fences monotonically") {
    val rows = ((1 to 9).map(v => ("g", v.toLong)) :+ ("g", 40L))
      .toDF("source", "n_chars")
    val tight = Outliers.tukeyFences(rows, "n_chars", "source", k = 0.5)
      .collect().head
    val wide = Outliers.tukeyFences(rows, "n_chars", "source", k = 10.0)
      .collect().head
    assert(tight.getLong(3) >= wide.getLong(3)) // n_high shrinks as k grows
    assert(wide.getDouble(5) > tight.getDouble(5))
  }
}
