package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The catalog leaves most small-side joins UNHINTED by design (ext13's
  * vocabulary, the Dsir/Outliers/Overlap enrichment joins) on the stated
  * premise that AQE re-plans them at runtime. This spec observes AQE
  * actually doing the two things that premise relies on — runtime
  * broadcast promotion and post-shuffle partition coalescing — so the
  * premise is a tested contract, not a comment.
  */
class AqeSpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.01"

  test("an unhinted join against a tiny aggregated side becomes a broadcast join at runtime") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val tiny = li.groupBy("l_returnflag").agg(count(lit(1)).as("n")) // 3 rows, unhinted
    val joined = li.join(tiny, Seq("l_returnflag"))
      .agg(sum(col("n")).as("s"))
    joined.collect() // AQE finalizes only after execution
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("AdaptiveSparkPlan isFinalPlan=true"), p.take(500))
    assert(p.contains("BroadcastHashJoin"),
      s"AQE should promote the 3-row side to broadcast:\n${p.take(2000)}")
  }

  test("post-shuffle partitions coalesce far below the configured count for small data") {
    // the shared test session runs with 4 shuffle partitions — raise to 32
    // for this test so the coalescing assertion has room to actually fail
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val agg = graft.sources.Tables.lineitem(spark, sf)
        .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)))
      agg.collect()
      val parts = agg.rdd.getNumPartitions
      assert(parts < 32, s"expected AQE to coalesce the tiny shuffle, got $parts partitions")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
