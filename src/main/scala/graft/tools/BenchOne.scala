package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev utility: time ONE catalog entry in isolation —
  * `runMain graft.tools.BenchOne <query_name> [sfDir] [repeats]`.
  * One untimed warm pass then `repeats` timed passes (min + all reported),
  * each fully materialized through the noop sink like [[graft.Bench]].
  * Runs against the RAW sf dir (no staging) — numbers are comparable to
  * each other across code versions, not to the staged BENCH artifacts;
  * use it to iterate on a single entry without paying the full suite.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <query_name> [sfDir] [repeats]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 2) args(2).toInt else 3
    val q = SparkEntry.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(s"local[$cpus]", cpus.toInt, appName = s"bench-one-$name")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(): Double = {
      val t0 = System.nanoTime()
      q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    graft.operators.MaterializedPairs.clear()
    once() // warm: codegen/classload + memo materialization
    val secs = (1 to repeats).map(_ => once())
    println(f"[bench-one] $name%s sf=$sfDir min=${secs.min}%.3f " +
      secs.map(s => f"$s%.3f").mkString("runs=[", ",", "]"))
    spark.stop()
  }
}
