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
    val dir = graft.ScratchDir.dir("csv")
    val nation = Tables.nation(spark, sf)
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    val inferred = Tables.csv(spark, dir)
    assert(inferred.count() == nation.count())
    val explicit = Tables.csv(spark, dir, Some(nation.schema))
    assert(explicit.schema == nation.schema)
    assert(explicit.count() == nation.count())
  }

  test("parquet schema evolution: mergeSchema unions batch schemas, old rows read NULL for new columns") {
    import spark.implicits._
    val dir = graft.ScratchDir.dir("evolve")
    // delivery 1: (id, text); delivery 2 adds a quality column
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
      .write.mode("append").parquet(dir)
    Seq((3L, "gamma", 0.9)).toDF("id", "text", "quality")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "quality", "text"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("quality")))
    assert(byId(3L).getAs[Double]("quality") == 0.9)
    assert(merged.count() == 3)
  }

  test("ORC round-trip preserves rows and values") {
    val dir = graft.ScratchDir.dir("orc")
    val nation = Tables.nation(spark, sf)
    nation.write.mode("overwrite").orc(dir)
    val back = Tables.orc(spark, dir)
    assert(back.schema == nation.schema)
    assert(back.collect().map(_.toSeq.toString).sorted.toSeq ==
      nation.collect().map(_.toSeq.toString).sorted.toSeq)
  }

  test("JSON round-trip preserves rows and values") {
    val dir = graft.ScratchDir.dir("json")
    val region = Tables.region(spark, sf)
    region.write.mode("overwrite").json(dir)
    val back = Tables.json(spark, dir, Some(region.schema))
    assert(back.collect().map(_.toSeq.toString).sorted.toSeq ==
      region.collect().map(_.toSeq.toString).sorted.toSeq)
  }
}
