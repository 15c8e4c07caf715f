package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class JsonlForeachWriterSpec extends AnyFunSuite with SparkTestSession {

  test("streams result rows one at a time into jsonl files") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val out = graft.ScratchDir.dir("few")
    val img = graft.ScratchDir.dir("few-img")
    val stream = MemoryStream[String]
    val t0 = 1700900000000L

    val q = MotionPipeline.toStorageLayout(
      MotionPipeline.detectBin(
        MotionPipeline.decodeWire(stream.toDF().toDF("value")), img))
      .writeStream
      .foreach(new JsonlForeachWriter(out))
      .start()
    stream.addData(
      FrameFixtures.frameJson("camF", t0, FrameFixtures.PosA),
      FrameFixtures.frameJson("camF", t0 + 1000, FrameFixtures.PosB))
    q.processAllAvailable()
    q.stop()

    val lines = new java.io.File(out).listFiles().filter(_.getName.endsWith(".jsonl"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
    assert(lines.length == 2)
    assert(lines.forall(_.contains("\"camera_id\":\"camF\"")))
    assert(lines.forall(_.contains("\"detection_type\":\"motion\"")))
  }

  test("control characters in string fields are escaped, keeping one record per line") {
    val out = graft.ScratchDir.dir("few-esc")
    val w = new JsonlForeachWriter(out)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any]("line1\nline2\ttab\"quote"), schema)
    assert(w.open(0, 0))
    w.process(row)
    w.close(null)
    val lines = new java.io.File(out).listFiles()
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
    assert(lines.length == 1)
    assert(lines.head == """{"s":"line1\nline2\ttab\"quote"}""")
  }
}
