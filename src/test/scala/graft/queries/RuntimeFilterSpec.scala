package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Runtime bloom-filter join pruning — the 100-TB lever for selective
  * fact-fact joins: when one side of a shuffle join carries a selective
  * filter, Catalyst's InjectRuntimeFilter builds a bloom filter over the
  * creation side's join keys and pushes a `might_contain` probe beneath the
  * other side's shuffle, so most of the big scan's rows die before they are
  * ever exchanged. This spec pins that the feature actually engages on this
  * engine's fact-fact shape (orders⋈lineitem with a selective orders
  * predicate) — the thresholds are production-tuned (the application side
  * must look 10 GB+), so the test lowers them and restores the conf after.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.001"

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dim-side predicate injects a bloom probe into the fact scan side") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // production default demands a 10 GB application side; the PLAN shape
      // is what we pin, so let it engage at fixture scale
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffle-join regime the filter exists for (with broadcast
      // available the probe is pointless and Catalyst skips it)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime bloom filter did not engage:\n${optimized.take(1500)}")
      // and the result is unchanged by the probe (it only prunes non-matches)
      val withFilter = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      val without = withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
          .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      }
      assert(withFilter == without)
    }
  }

  test("the probe does not fire when the creation side is not selective (no filter, no benefit)") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val orders = spark.read.parquet(s"$sf/orders.parquet") // unfiltered
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      val p = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("might_contain"),
        "an unselective creation side must not pay for a useless bloom build")
    }
  }
}
