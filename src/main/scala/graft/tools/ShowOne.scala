package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev utility: materialize ONE catalog entry and print its rows —
  * `runMain graft.tools.ShowOne <query_name> [sfDir] [maxRows]`.
  * The batch twin of [[BenchOne]] for iterating on an entry's OUTPUT
  * (shape, classes, counts) instead of its wall-clock.
  */
object ShowOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ShowOne <query_name> [sfDir] [maxRows]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val maxRows = if (args.length > 2) args(2).toInt else 50
    val q = SparkEntry.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession
      .builder(s"local[$cpus]", cpus.toInt, appName = s"show-one-$name")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one materialization feeds both the preview and the count — the
    // heavyweight entries this tool exists for must not run twice
    val df = q.build(spark, sfDir).cache()
    df.show(maxRows, truncate = false)
    println(s"[show-one] $name rows=${df.count()}")
    spark.stop()
  }
}
