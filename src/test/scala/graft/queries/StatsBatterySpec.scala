package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** q40 computes corr/covar/stddev/skewness/kurtosis from exact integer power
  * sums (the engine-portable formulation — builtin float accumulation is
  * order-dependent and DuckDB's skew/kurt are bias-corrected where Spark's
  * are population moments). This spec pins the algebra: the portable
  * formulas must agree with Spark's own builtin aggregates to float
  * tolerance on the same data.
  */
class StatsBatterySpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.001"

  test("q40 moment-sum formulas match Spark's builtin corr/covar/stddev/skew/kurt") {
    val got = SparkEntry.queries("q40_stats_battery")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap

    val ref = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        corr(col("l_quantity"), col("l_extendedprice")).as("corr_b"),
        covar_pop(col("l_quantity"), col("l_extendedprice")).as("covar_b"),
        stddev_samp(col("l_quantity")).as("stddev_b"),
        skewness(col("l_quantity")).as("skew_b"),
        kurtosis(col("l_quantity")).as("kurt_b"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(got.keySet == ref.keySet && got.nonEmpty)
    got.foreach { case (flag, g) =>
      val r = ref(flag)
      assert(g.getLong(1) == r.getLong(1), s"$flag n")
      def close(a: Double, b: Double, what: String, tol: Double = 1e-4): Unit =
        assert(math.abs(a - b) <= tol * math.max(1.0, math.abs(b)), s"$flag $what: $a vs $b")
      close(g.getDouble(2), r.getDouble(2), "corr")
      close(g.getDouble(3), r.getDouble(3), "covar_pop")
      close(g.getDouble(4), r.getDouble(4), "stddev")
      close(g.getDouble(5), r.getDouble(5), "skewness")
      close(g.getDouble(6), r.getDouble(6), "kurtosis")
    }
  }

  test("q46 recursive spine yields all 30 days and zero-fills the empty ones at sf0.001") {
    val rows = SparkEntry.queries("q46_calendar_fill")(spark, sf).collect()
    assert(rows.length == 30)
    val zeros = rows.count(_.getAs[Long]("n_purchases") == 0L)
    assert(zeros == 11, s"expected 11 empty days at sf0.001, got $zeros")
    rows.filter(_.getAs[Long]("n_purchases") == 0L)
      .foreach(r => assert(r.getAs[Double]("revenue") == 0.0))
  }

  test("q50's z-score branch is LIVE: non-null scores exist at sf0.001 (dead-dial guard)") {
    // the query's first version had an unreachable n >= 5 branch (1-hour
    // frames never collect 5 readings in this data) — every zscore was
    // NULL and the oracle hash-passed vacuously. Pin liveness so a frame/
    // threshold change can't silently kill the semantics again.
    val rows = SparkEntry.queries("q50_rolling_anomaly")(spark, sf).collect()
    val live = rows.count(!_.isNullAt(5))
    assert(live > 0, "no non-null zscores — the anomaly branch is dead again")
    assert(live < rows.length, "every row scored — the n>=5 warmup guard stopped working")
  }

  test("ext54's pruning is LIVE: the gate corpus produces actual drops (dead-dial guard)") {
    val dropped = SparkEntry.queries("ext54_semdedup")(spark, "/root/testdata/sf0.01")
      .agg(sum("n_dropped")).head().getLong(0)
    assert(dropped > 0, "semDedup dropped nothing — threshold no longer inside the corpus cosine range")
  }

  test("ext58's OOV dial is LIVE: rates are neither all zero nor all one (dead-dial guard)") {
    val rates = SparkEntry.queries("ext58_oov_rate")(spark, "/root/testdata/sf0.01")
      .collect().map(_.getAs[Double]("oov_rate"))
    assert(rates.exists(_ > 0), "all OOV rates zero — vocab covers the whole corpus again")
    assert(rates.forall(_ < 1), "OOV rate of 1 — vocab matches nothing")
  }

  test("q40 plan is one scan with a partial/final hash aggregate pair — no extra shuffle") {
    val plan = SparkEntry.queries("q40_stats_battery")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    // exactly one exchange: the partial→final agg shuffle on l_returnflag
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }
}
