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

  test("a skewed join key is split across tasks at runtime (OptimizeSkewedJoin)") {
    // the 100×-scale lifesaver: one hot key must not pin a whole join to a
    // single straggler task. Build a join where ~all left rows share key 0,
    // lower the skew thresholds to fixture scale (defaults are 256 MB), and
    // disable broadcast so the join stays sort-merge — then assert AQE
    // re-planned it as a skew join (the hot partition read in slices).
    val keep = Seq(
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
      val pad = lit("x" * 200)
      val left = spark.range(0, 100000).toDF("id")
        .select(when(col("id") < 95000, lit(0L)).otherwise(col("id") % 50).as("k"),
          concat(col("id").cast("string"), pad).as("payload"))
      val right = spark.range(0, 50).toDF("k").withColumn("w", col("k") * 2)
      // the payload must be REFERENCED downstream or column pruning strips
      // it before the shuffle and no partition ever crosses the threshold
      val joined = left.join(right, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("s"),
          sum(length(col("payload"))).as("bytes"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("AdaptiveSparkPlan isFinalPlan=true"), p.take(500))
      assert(p.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot key 0 partition:\n${p.take(3000)}")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
