package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dump formatted physical plans for named queries (dev aid):
  * runMain graft.tools.Plans q05_star_join q01_pricing_summary
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder("local[4]", 4, appName = "graft-plans")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // The no-args sweep skips eagerLifecycle entries: their build runs a
    // whole streaming/store arc just to print a LocalRelation plan. Name
    // one explicitly to pay that cost on purpose.
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.all.filterNot(_.eagerLifecycle).map(_.name)
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
