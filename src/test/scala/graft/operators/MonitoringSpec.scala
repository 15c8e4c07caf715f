package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CUSUM secondary-sort fold: golden recurrence values, per-key isolation,
  * reset/alarm behavior, and partition-layout invariance (the fold must
  * depend only on the declared (key, ord, tie) order, never on how rows
  * arrived).
  */
class MonitoringSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, Double)], parts: Int) =
    Monitoring.cusum(
      rows.toDF("k", "o", "t", "v").repartition(parts), "k", "o", "t", "v",
      drift = "10", threshold = "15")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(4).doubleValue(), r.getBoolean(5)))
      .sortBy(x => (x._1, x._2))

  test("golden recurrence: accumulate, alarm past threshold, reset at zero floor") {
    // x - drift per step: +5, +8, +8 (alarm at 21 > 15), -21 -> floor 0, +2
    val got = run(Seq(
      ("a", 1L, 1L, 15.0), ("a", 2L, 2L, 18.0), ("a", 3L, 3L, 18.0),
      ("a", 4L, 4L, 0.0), ("a", 5L, 5L, 12.0)), parts = 3)
    assert(got.map(x => (x._3, x._4)).toSeq == Seq(
      (5.0, false), (13.0, false), (21.0, true), (11.0, false), (13.0, false)))
  }

  test("keys are isolated: a hot key never bleeds its statistic into a neighbor") {
    val got = run(Seq(
      ("hot", 1L, 1L, 100.0), ("hot", 2L, 2L, 100.0),
      ("cold", 1L, 3L, 1.0)), parts = 2)
    val cold = got.filter(_._1 == "cold")
    assert(cold.map(x => (x._3, x._4)).toSeq == Seq((0.0, false)),
      "cold's first row starts from zero, not from hot's running sum")
    assert(got.filter(_._1 == "hot").last._4, "hot alarms at 180 > 15")
  }

  test("partition layout and arrival order never change the result") {
    val rnd = new scala.util.Random(3)
    val rows = rnd.shuffle((1 to 200).map { i =>
      (s"k${i % 5}", i.toLong, i.toLong, rnd.nextInt(25).toDouble)
    })
    val a = run(rows, parts = 1)
    val b = run(rows, parts = 13)
    assert(a.toSeq == b.toSeq)
  }
}
