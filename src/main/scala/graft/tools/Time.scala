package graft.tools

import graft.SparkEntry

/** Time named queries against SPARK_GRAFT_SF_DIR (dev aid, not a driver
  * contract main): one untimed warm pass then a timed noop-sink run each —
  * the same discipline Bench uses, without staging the whole suite.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.Time ext32_kmeans_distributed ext54_semdedup"
  *
  * SPARK_GRAFT_STAGE=1 first rewrites the SF dir through [[graft.Bench.stage]]
  * (multi-file splits) so per-query numbers are comparable to Bench's — the
  * raw single-file fixtures scan as ONE task and hide per-row cost.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val rawDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", cpus.toInt, appName = "graft-time").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir =
      if (sys.env.get("SPARK_GRAFT_STAGE").contains("1"))
        graft.Bench.stage(spark, rawDir, splits = cpus.toInt)
      else rawDir
    require(args.nonEmpty, "usage: Time <query-name> [<query-name> ...]")
    // per-query shuffle tally (Bench's listener, shared) so a plan
    // change's shuffle-volume effect is visible without a full bench pass
    val tally = new graft.Bench.ShuffleTally
    val (read, write) = (tally.read, tally.write)
    spark.sparkContext.addSparkListener(tally)
    args.foreach { n =>
      val run = () => SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      run() // warm: codegen + classload, untimed
      org.apache.spark.graft.ListenerGlue.drain(spark.sparkContext)
      val (r0, w0) = (read.get(), write.get())
      val t0 = System.nanoTime()
      run()
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerGlue.drain(spark.sparkContext)
      println(f"[time] $n: $secs%.3f s  shuffle_write=${(write.get() - w0) / 1e6}%.1f MB  shuffle_read=${(read.get() - r0) / 1e6}%.1f MB")
    }
    spark.stop()
  }
}
