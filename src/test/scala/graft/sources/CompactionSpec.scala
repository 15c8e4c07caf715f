package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CompactionSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("dynamic partition overwrite reprocesses ONE day idempotently, leaving siblings untouched") {
    // the lakehouse correction contract: re-running a day's pipeline with
    // fixed data must replace exactly that day's partition — static
    // overwrite mode would wipe the whole table
    val dir = graft.ScratchDir.dir("dpo")
    def rows(day: String, tag: String) =
      (1 to 4).map(i => ("camA", day, s"$tag-$i")).toDF("camera_id", "day", "payload")
    rows("2024-01-01", "orig").unionAll(rows("2024-01-02", "orig"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)

    val before = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      rows("2024-01-02", "fixed")
        .write.partitionBy("day").mode("overwrite").parquet(dir)
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    val res = spark.read.parquet(dir)
    assert(res.count() == 8)
    // partition-column inference reads the day dir back as DateType
    val byDay = res.collect().groupBy(_.getAs[AnyRef]("day").toString)
    assert(byDay("2024-01-01").forall(_.getAs[String]("payload").startsWith("orig-")))
    assert(byDay("2024-01-02").forall(_.getAs[String]("payload").startsWith("fixed-")))
  }

  private def write(dir: String, day: String, n: Int, batches: Int): Unit =
    (1 to batches).foreach { b =>
      (1 to n).map(i => ("camA", day, s"row-$day-$b-$i"))
        .toDF("camera_id", "day", "payload")
        .repartition(2) // several small files per append, like micro-batches
        .write.mode("append").partitionBy("camera_id", "day").parquet(dir)
    }

  private def filesIn(dir: String, day: String): Int =
    Option(new java.io.File(s"$dir/camera_id=camA/day=$day").listFiles())
      .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)

  test("compaction rewrites old partitions into few files and leaves fresh ones alone") {
    val dir = graft.ScratchDir.dir("compact")
    write(dir, "2024-01-01", n = 10, batches = 5) // historical: 10 small files
    write(dir, "2024-01-02", n = 10, batches = 5) // "today": must stay untouched
    val before = spark.read.parquet(dir).select("payload").as[String].collect().sorted
    assert(filesIn(dir, "2024-01-01") == 10)

    val rewritten = Compaction.compactResults(spark, dir, beforeDay = "2024-01-02")
    assert(rewritten == 50)
    assert(filesIn(dir, "2024-01-01") <= 2) // coalesced
    assert(filesIn(dir, "2024-01-02") == 10) // untouched partition
    // zero data change
    val after = spark.read.parquet(dir).select("payload").as[String].collect().sorted
    assert(after.toSeq == before.toSeq)
  }

  test("a big partition splits across multiple files when over the target size") {
    val dir = graft.ScratchDir.dir("compact3")
    write(dir, "2024-01-01", n = 2000, batches = 3)
    // tiny target forces several output files for the single partition —
    // the salt is what lets equal (camera_id, day) rows reach >1 writer
    Compaction.compactResults(spark, dir, "2024-02-01", targetFileBytes = 8 * 1024)
    assert(filesIn(dir, "2024-01-01") > 1)
    assert(spark.read.parquet(dir).count() == 6000)
  }

  test("watermark clamp: a too-eager cutoff is pulled back to the safe day") {
    val dir = graft.ScratchDir.dir("compact4")
    write(dir, "2024-01-01", n = 4, batches = 3)
    write(dir, "2024-01-03", n = 4, batches = 3)
    // watermark sits mid-2024-01-03 → with the 6 h margin only days before
    // 2024-01-03 are sealed; the caller's beforeDay = 2024-01-04 must NOT
    // rewrite the still-appendable 01-03 partition
    val wmMs = java.time.Instant.parse("2024-01-03T12:00:00Z").toEpochMilli
    val rewritten = Compaction.compactResults(
      spark, dir, beforeDay = "2024-01-04", watermarkMs = Some(wmMs))
    assert(rewritten == 12) // only 2024-01-01
    assert(filesIn(dir, "2024-01-01") <= 2)
    assert(filesIn(dir, "2024-01-03") == 6) // untouched: watermark not past it
    assert(Compaction.safeCutoffDay(wmMs) == "2024-01-03")
  }

  test("no-op when nothing is older than the cutoff") {
    val dir = graft.ScratchDir.dir("compact2")
    write(dir, "2024-03-05", n = 4, batches = 2)
    assert(Compaction.compactResults(spark, dir, "2024-01-01") == 0)
    assert(filesIn(dir, "2024-03-05") == 4)
  }
}
