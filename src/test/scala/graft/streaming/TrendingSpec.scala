package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TrendingSpec extends AnyFunSuite with SparkTestSession {

  private def run(batches: Seq[Seq[(String, String)]], k: Int, topN: Int) = {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(String, String)]
    val sink = s"trend_${System.nanoTime()}"
    val q = Trending.trendingTopK(stream.toDF().toDF("g", "item"), "g", "item", k, topN)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Update()).start()
    batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(sink).collect()
  }

  test("counts accumulate across micro-batches and the top item is exact for heavy keys") {
    val rows = run(Seq(
      Seq(("click", "a"), ("click", "a"), ("click", "b")),
      Seq(("click", "a"), ("click", "c"))), k = 8, topN = 2)
    // last batch's emission reflects the accumulated sketch: a=3 of 5
    val last = rows.filter(_.getAs[Long]("n_total") == 5L)
    assert(last.nonEmpty, "expected an emission after the second batch")
    val top = last.find(_.getAs[Int]("rank") == 1).get
    assert(top.getAs[String]("item") == "a" && top.getAs[Long]("est_n") == 3L)
  }

  test("state stays O(k): many distinct items never grow the sketch past k counters") {
    val items = (1 to 40).map(i => ("t", s"item$i"))
    val rows = run(Seq(items, Seq(("t", "hot"), ("t", "hot"), ("t", "hot"))), k = 4, topN = 4)
    // at most k rows emitted per batch (the sketch holds <= k counters)
    rows.groupBy(_.getAs[Long]("n_total")).foreach { case (_, emitted) =>
      assert(emitted.length <= 4)
    }
    // the heavy late arrival still surfaces at rank 1 (MG's guarantee:
    // 3 occurrences against undercount n/(k+1) of prior noise)
    val last = rows.filter(_.getAs[Long]("n_total") == 43L)
    assert(last.exists(r => r.getAs[Int]("rank") == 1 && r.getAs[String]("item") == "hot"))
  }

  test("sketch state survives a query restart from the checkpoint") {
    // the MG counters live in keyed state: a NEW query resumed from the
    // same checkpoint must carry them forward, or every restart silently
    // zeroes trending history (MotionPipeline has the same guard for its
    // per-camera planes)
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(String, String)]
    val ckpt = graft.ScratchDir.dir("trend-ckpt")
    val out = graft.ScratchDir.dir("trend-out")
    def runOnce(): Array[org.apache.spark.sql.Row] = {
      // foreachBatch parquet append: the memory sink refuses checkpoint
      // recovery, and this is the production sink shape anyway
      val q = Trending.trendingTopK(stream.toDF().toDF("g", "item"), "g", "item",
          k = 8, topN = 2)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .start()
      q.awaitTermination()
      spark.read.parquet(out).collect()
    }
    stream.addData(("click", "a"), ("click", "a"), ("click", "b"))
    assert(runOnce().exists(r => r.getAs[String]("item") == "a" &&
      r.getAs[Long]("est_n") == 2L && r.getAs[Long]("n_total") == 3L))
    // second query, same checkpoint: counters restored, so the new batch
    // ACCUMULATES (a reaches 3 of 5) instead of restarting from zero
    stream.addData(("click", "a"), ("click", "c"))
    val resumed = runOnce().filter(_.getAs[Long]("n_total") == 5L)
    assert(resumed.nonEmpty, "restarted query should emit from restored state")
    val top = resumed.find(_.getAs[Int]("rank") == 1).get
    assert(top.getAs[String]("item") == "a" && top.getAs[Long]("est_n") == 3L)
  }

  test("groups keep independent sketches") {
    val rows = run(Seq(Seq(
      ("x", "a"), ("x", "a"), ("y", "b"))), k = 4, topN = 1)
    val byGroup = rows.groupBy(_.getAs[String]("group"))
    assert(byGroup("x").head.getAs[String]("item") == "a")
    assert(byGroup("y").head.getAs[String]("item") == "b")
    assert(byGroup("y").head.getAs[Long]("n_total") == 1L)
  }
}
