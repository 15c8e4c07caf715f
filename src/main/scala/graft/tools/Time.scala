package graft.tools

import graft.SparkEntry

/** Time named queries against SPARK_GRAFT_SF_DIR (dev aid, not a driver
  * contract main): one untimed warm pass then a timed noop-sink run each —
  * the same discipline Bench uses, without staging the whole suite.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.Time ext32_kmeans_distributed ext54_semdedup"
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", cpus.toInt, appName = "graft-time").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(args.nonEmpty, "usage: Time <query-name> [<query-name> ...]")
    args.foreach { n =>
      val run = () => SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      run() // warm: codegen + classload, untimed
      val t0 = System.nanoTime()
      run()
      println(f"[time] $n: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
