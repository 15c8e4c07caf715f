package graft.tools

/** Dev utility: stage an SF dir into the multi-file layout [[graft.Bench]]
  * benchmarks against — `runMain graft.tools.StageDir [sfDir] [outTag]` —
  * so BenchOne/Plans runs can be profiled at the same scan parallelism the
  * bench measures. Prints the staged dir path; the caller owns cleanup.
  */
object StageDir {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", cpus.toInt, appName = "graft-stage")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = graft.Bench.stage(spark, sfDir, splits = cpus.toInt)
    println(s"[stage-dir] $out")
    spark.stop()
  }
}
