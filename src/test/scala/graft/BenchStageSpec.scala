package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench staging harness must mirror the fixture directory exactly: a
  * table added to the fixtures later is staged automatically (the
  * hard-coded-list failure mode was a confusing path-not-found at query
  * time), sized by the bytes-per-split rule.
  */
class BenchStageSpec extends AnyFunSuite with SparkTestSession {

  test("stage enumerates every fixture table and splits by file size") {
    // Bench runs under GraftSession, which pins this for the events table;
    // the shared test session needs it set explicitly before the raw read
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sfDir = "/root/testdata/sf0.001"
    val staged = Bench.stage(spark, sfDir, splits = 8)
    try {
      val fixtures = new java.io.File(sfDir).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
      val stagedTables = new java.io.File(staged).listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(stagedTables == fixtures)
      // every staged table reads back with the original row count
      fixtures.foreach { t =>
        val orig =
          if (t == "events.parquet") graft.sources.Tables.events(spark, sfDir).count()
          else spark.read.parquet(s"$sfDir/$t").count()
        val got =
          if (t == "events.parquet") graft.sources.Tables.events(spark, staged).count()
          else spark.read.parquet(s"$staged/$t").count()
        assert(got == orig, s"$t row count changed by staging")
      }
      // dims stay single-file; every table stages to at least one part
      val regionParts = new java.io.File(s"$staged/region.parquet")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(regionParts == 1, "tiny dim must stay single-split")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(staged))
    }
  }
}
