package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** File-format scans (SURVEY.md §2.B sources): parquet (the default
  * everywhere), CSV and JSON round-trips with schema preservation.
  */
class TablesSpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.001"

  test("events loader exposes µs ts and TimestampType ts from the nanos column") {
    val e = Tables.events(spark, sf)
    assert(e.schema("ts_us").dataType.typeName == "long")
    assert(e.schema("ts").dataType.typeName == "timestamp")
    val row = e.select("ts_us", "ts").head
    assert(row.getTimestamp(1).getTime == row.getLong(0) / 1000)
  }

  test("CSV round-trip preserves rows; explicit schema avoids inference") {
    val dir = Files.createTempDirectory("csv").toString
    val nation = Tables.nation(spark, sf)
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    val inferred = Tables.csv(spark, dir)
    assert(inferred.count() == nation.count())
    val explicit = Tables.csv(spark, dir, Some(nation.schema))
    assert(explicit.schema == nation.schema)
    assert(explicit.count() == nation.count())
  }

  test("ORC round-trip preserves rows and values") {
    val dir = Files.createTempDirectory("orc").toString
    val nation = Tables.nation(spark, sf)
    nation.write.mode("overwrite").orc(dir)
    val back = Tables.orc(spark, dir)
    assert(back.schema == nation.schema)
    assert(back.collect().map(_.toSeq.toString).sorted.toSeq ==
      nation.collect().map(_.toSeq.toString).sorted.toSeq)
  }

  test("JSON round-trip preserves rows and values") {
    val dir = Files.createTempDirectory("json").toString
    val region = Tables.region(spark, sf)
    region.write.mode("overwrite").json(dir)
    val back = Tables.json(spark, dir, Some(region.schema))
    assert(back.collect().map(_.toSeq.toString).sorted.toSeq ==
      region.collect().map(_.toSeq.toString).sorted.toSeq)
  }
}
