package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SURVEY.md §5.2 items 2–3: stateful operator + end-to-end pipeline tests
  * on deterministic fixtures. Covers per-frame result emission (first frame
  * of a key included), PNG-only-on-motion, per-key isolation, in-batch
  * event-time re-ordering, and state carry-over across micro-batches AND
  * across query restarts from the checkpoint.
  */
class MotionPipelineSpec extends AnyFunSuite with SparkTestSession {

  private def tmp(prefix: String): String =
    graft.ScratchDir.dir(prefix)

  private def pngs(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).map(_.toSeq.sorted).getOrElse(Nil)
  }

  test("Kafka plan parity, pinned structurally: the frame-parse chain " +
      "above the source leaf is source-invariant, and the Kafka builder's " +
      "offline failure is the CONNECTOR boundary, never a plan mismatch") {
    // r15 verdict #4: framesStreamFromKafka's doc claims "the produced
    // plan is identical to the JSON path after the value projection".
    // The Kafka leaf itself cannot be constructed here (no
    // spark-sql-kafka connector jar in the offline image — load() fails
    // resolving the data source, before any plan exists), so the claim
    // is pinned at its actual content: parseFrames builds ONE downstream
    // operator chain over ANY (value STRING) relation — batch file,
    // streaming file, or an arbitrary local relation standing in for the
    // Kafka value projection — with identical node structure and schema.
    import org.apache.spark.sql.catalyst.plans.logical.LeafNode
    def chain(ds: org.apache.spark.sql.Dataset[_]): Seq[String] =
      ds.queryExecution.analyzed.collect {
        case n if !n.isInstanceOf[LeafNode] => n.nodeName
      }
    val in = tmp("kafka-parity")
    val lines = FrameFixtures.sequence("camA", 1700000000000L, 2,
      moving = false)
    Files.write(Paths.get(in, "wire.jsonl"),
      String.join("\n", lines: _*).getBytes)
    val batch = MotionPipeline.framesFromJson(spark, in)
    val stream = MotionPipeline.framesStreamFromJson(spark, in)
    // the stand-in for Kafka's `CAST(value AS STRING) AS value` output
    import spark.implicits._
    val generic = MotionPipeline.parseFrames(
      Seq("not json").toDF("value"))
    assert(chain(batch) == chain(stream),
      s"batch=${chain(batch)} stream=${chain(stream)}")
    assert(chain(generic) == chain(stream),
      s"generic=${chain(generic)} stream=${chain(stream)}")
    assert(batch.schema == stream.schema && generic.schema == stream.schema)
    // the offline boundary is the missing connector, surfaced while
    // resolving the source — not a divergent downstream plan
    val e = intercept[Exception] {
      MotionPipeline.framesStreamFromKafka(spark, "broker:9092")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  test("batch end-to-end: one result per frame, PNGs only for motion frames") {
    val in = tmp("frames-in"); val img = tmp("frames-img"); val table = tmp("frames-out")
    val t0 = 1700000000000L
    // camA: 4 frames moving square → motion on frames 2..4
    // camB: 3 frames static square → no motion at all
    val lines = FrameFixtures.sequence("camA", t0, 4, moving = true) ++
      FrameFixtures.sequence("camB", t0, 3, moving = false)
    Files.write(Paths.get(in, "batch.jsonl"), String.join("\n", lines: _*).getBytes)

    MotionPipeline.runBatch(spark, in, table, img)

    val results = spark.read.parquet(table)
    assert(results.count() == 7) // every frame emits exactly one row
    assert(results.where("detection_type = 'motion' AND detection_count = 1").count() == 7)
    // partitioned storage layout (camera_id, day)
    assert(new java.io.File(s"$table/camera_id=camA").exists())
    assert(new java.io.File(s"$table/camera_id=camB").exists())
    // PNG side-output: camA frames 2..4 moved; camB never did
    assert(pngs(img) == (1 to 3).map(i => s"camA-T-${t0 + i * 1000L}.png"))
    // image_path populated for every row, motion or not (reference quirk)
    assert(results.where("image_path IS NULL").count() == 0)
  }

  test("unsorted input within a key is re-ordered by event time before detection") {
    val img = tmp("sort-img")
    val t0 = 1700100000000L
    val shuffled = Seq(2, 0, 3, 1).map(i =>
      FrameFixtures.frameJson("camS", t0 + i * 1000L,
        squareX = if (i % 2 == 1) FrameFixtures.PosB else FrameFixtures.PosA))
    import spark.implicits._
    val results = MotionPipeline.detect(
      MotionPipeline.parseFrames(shuffled.toDF("value")), img).collect()
    assert(results.length == 4)
    // processed 0,1,2,3 in time order → motion PNGs for frames 1..3 exactly
    assert(pngs(img) == (1 to 3).map(i => s"camS-T-${t0 + i * 1000L}.png"))
  }

  test("decodeWire fast path agrees with the from_json path and drops malformed rows") {
    import spark.implicits._
    val t0 = 1700250000000L
    val good = Seq(
      FrameFixtures.frameJson("camW", t0, FrameFixtures.PosA),
      FrameFixtures.frameJson("camW", t0 + 1000, FrameFixtures.PosB))
    val junk = Seq("""{"not json""", """{"camId":null,"rows":1}""", "", "42",
      """{"timestamp":"2024-01-01T00:00:00Z","rows":2}""")
    val raw = (good ++ junk).toDF("value")

    val fast = MotionPipeline.decodeWire(raw).collect()
      .sortBy(_.timestamp.getTime)
    val slow = MotionPipeline.parseFrames(raw).collect()
      .sortBy(_.timestamp.getTime)
    assert(fast.length == 2 && slow.length == 2)
    fast.zip(slow).foreach { case (f, s) =>
      assert(f.camId == s.camId)
      assert(f.timestamp == s.timestamp)
      assert((f.rows, f.cols, f.matType) == (s.rows, s.cols, s.matType))
      assert(f.px.toSeq == java.util.Base64.getDecoder.decode(s.data).toSeq)
    }

    // identical detection results through either path
    val imgA = tmp("wire-a"); val imgB = tmp("wire-b")
    val viaFast = MotionPipeline.detectBin(MotionPipeline.decodeWire(raw), imgA)
      .collect().map(r => (r.cameraId, r.frameTimestamp, r.detectionCount)).sortBy(_.toString)
    val viaSlow = MotionPipeline.detect(MotionPipeline.parseFrames(raw), imgB)
      .collect().map(r => (r.cameraId, r.frameTimestamp, r.detectionCount)).sortBy(_.toString)
    assert(viaFast.toSeq == viaSlow.toSeq)
    assert(pngs(imgA) == pngs(imgB))
  }

  test("malformed and null-field JSON rows are dropped before the operator") {
    import spark.implicits._
    val good = FrameFixtures.frameJson("camX", 1700200000000L, 4)
    val rows = Seq(good,
      """{"not json""",
      """{"camId":null,"rows":1}""",
      "", "42",
      // missing timestamp / missing geometry — would poison the typed
      // encoder and the state fn's path derivation if not dropped here
      """{"camId":"camX","rows":2,"cols":2,"type":16,"data":"AAAA"}""",
      """{"camId":"camX","timestamp":"2024-01-01T00:00:00Z","data":"AAAA"}""")
    val parsed = MotionPipeline.parseFrames(rows.toDF("value")).collect()
    assert(parsed.map(_.camId).toSeq == Seq("camX"))
    val fast = MotionPipeline.decodeWire(rows.toDF("value")).collect()
    assert(fast.map(_.camId).toSeq == Seq("camX"))
  }

  test("corrupt base64 payload skips the frame without advancing state") {
    val img = tmp("corrupt-img")
    val t0 = 1700300000000L
    val bad = s"""{"camId":"camC","timestamp":"${java.time.Instant.ofEpochMilli(t0 + 1000)}","rows":48,"cols":48,"type":16,"data":"AAAA"}"""
    val lines = Seq(
      FrameFixtures.frameJson("camC", t0, FrameFixtures.PosA),
      bad, // wrong payload length → skipped
      FrameFixtures.frameJson("camC", t0 + 2000, FrameFixtures.PosB))
    import spark.implicits._
    val results = MotionPipeline.detect(
      MotionPipeline.parseFrames(lines.toDF("value")), img).collect()
    // 2 valid frames → 2 rows; diff runs frame1 vs frame3 (skip didn't clear state)
    assert(results.length == 2)
    assert(pngs(img) == Seq(s"camC-T-${t0 + 2000}.png"))
  }

  test("streaming: state carries across micro-batches and query restarts") {
    val img = tmp("stream-img"); val table = tmp("stream-out"); val ckpt = tmp("stream-ckpt")
    val t0 = 1700400000000L
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val source = MemoryStream[String]
    val frames = MotionPipeline.parseFrames(source.toDF().toDF("value"))
    def runOnce(): Unit = {
      val q = MotionPipeline.writeResults(
        MotionPipeline.detect(frames, img), table, ckpt, Trigger.AvailableNow())
      q.awaitTermination()
    }

    // batch 1: two frames, square moves → 1 PNG (frame 2 vs frame 1)
    source.addData(FrameFixtures.frameJson("camZ", t0, FrameFixtures.PosA))
    source.addData(FrameFixtures.frameJson("camZ", t0 + 1000, FrameFixtures.PosB))
    runOnce()
    assert(spark.read.parquet(table).count() == 2)
    assert(pngs(img) == Seq(s"camZ-T-${t0 + 1000}.png"))

    // batch 2 on a NEW query from the same checkpoint: the previous plane
    // must be restored — frame 3 diffs against frame 2, not against nothing.
    source.addData(FrameFixtures.frameJson("camZ", t0 + 2000, FrameFixtures.PosA))
    runOnce()
    assert(spark.read.parquet(table).count() == 3)
    assert(pngs(img) == Seq(s"camZ-T-${t0 + 1000}.png", s"camZ-T-${t0 + 2000}.png"))

    // static follow-up frame → row emitted, no new PNG
    source.addData(FrameFixtures.frameJson("camZ", t0 + 3000, FrameFixtures.PosA))
    runOnce()
    assert(spark.read.parquet(table).count() == 4)
    assert(pngs(img).length == 2)
  }

  test("runStream watches a directory end-to-end: new files become new rows + PNGs") {
    val in = tmp("rs-in"); val table = tmp("rs-out")
    val img = tmp("rs-img"); val ckpt = tmp("rs-ckpt")
    val t0 = 1700950000000L

    Files.write(Paths.get(in, "a.jsonl"), String.join("\n",
      FrameFixtures.frameJson("camR", t0, FrameFixtures.PosA),
      FrameFixtures.frameJson("camR", t0 + 1000, FrameFixtures.PosB)).getBytes)
    val q1 = MotionPipeline.runStream(spark, in, table, img, ckpt)
    q1.awaitTermination()
    assert(spark.read.parquet(table).count() == 2)
    assert(pngs(img) == Seq(s"camR-T-${t0 + 1000}.png"))

    // drop a second file; a new query from the same checkpoint only reads
    // the new file and carries the camera state forward
    Files.write(Paths.get(in, "b.jsonl"),
      FrameFixtures.frameJson("camR", t0 + 2000, FrameFixtures.PosA).getBytes)
    val q2 = MotionPipeline.runStream(spark, in, table, img, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(table).count() == 3)
    assert(pngs(img).length == 2) // frame 3 moved vs frame 2 from the old file
  }

  test("detectBinExpiring degrades to plain detect on batch inputs") {
    import spark.implicits._
    val t0 = 1700995000000L
    val img = tmp("ttlb-img")
    val lines = Seq(
      FrameFixtures.frameJson("camQ", t0, FrameFixtures.PosA),
      FrameFixtures.frameJson("camQ", t0 + 1000, FrameFixtures.PosB))
    val res = MotionPipeline.detectBinExpiring(
      MotionPipeline.decodeWire(lines.toDF("value")), img).collect()
    assert(res.length == 2) // no watermark machinery in batch — no crash
    assert(pngs(img).length == 1)
  }

  test("detectBinExpiring evicts idle-camera state past the watermark") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val t0 = 1700990000000L
    val img = tmp("ttl-img")
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val sink = s"sink_${System.nanoTime()}"
    val q = MotionPipeline.detectBinExpiring(
      MotionPipeline.decodeWire(stream.toDF().toDF("value")), img,
      watermarkDelay = "1 second", idleTimeoutMillis = 60_000L)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()

    // batch 1: camA frame — state created, timeout armed at t0+60s
    stream.addData(FrameFixtures.frameJson("camA", t0, FrameFixtures.PosA))
    q.processAllAvailable()
    // batch 2: camB an hour later pushes the watermark far past camA's
    // timeout; batch 3 lets the expired timer fire and evict camA
    stream.addData(FrameFixtures.frameJson("camB", t0 + 3600_000L, FrameFixtures.PosA))
    q.processAllAvailable()
    stream.addData(FrameFixtures.frameJson("camB", t0 + 3610_000L, FrameFixtures.PosA))
    q.processAllAvailable()
    // batch 4: camA returns MOVED — with its plane evicted this is a fresh
    // first frame: a row is emitted but no diff runs, so NO motion PNG
    stream.addData(FrameFixtures.frameJson("camA", t0 + 3620_000L, FrameFixtures.PosB))
    q.processAllAvailable()
    q.stop()

    val results = spark.table(sink).collect()
    assert(results.length == 4) // every frame still emits its row
    assert(pngs(img).isEmpty) // eviction prevented the would-be motion diff
  }

  test("DIRECT output parity: detectTws and detectBin emit identical " +
      "rows and PNGs when driven over the same fixture stream") {
    // r15 verdict #7: the promotion-parity pin. The restart spec below
    // asserts each path against ABSOLUTE expectations; this one runs the
    // SAME two-wave fixture (two cameras, moving + static, restart
    // between waves) through BOTH operators and diffs their outputs
    // directly — id (UUID) and processing_timestamp (wall clock) are the
    // only columns excluded, and image_path is compared by file name
    // (the dir prefix differs per run by construction).
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevConf = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t0 = 1700995000000L
      def drive(tag: String,
          detect: (org.apache.spark.sql.Dataset[MotionPipeline.BinFrame], String) =>
            org.apache.spark.sql.Dataset[graft.model.ProcessingResult])
          : (Seq[String], Seq[String]) = {
        val img = tmp(s"par-$tag-img"); val table = tmp(s"par-$tag-out")
        val ckpt = tmp(s"par-$tag-ckpt")
        val stream =
          org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
        def runOnce(): Unit = {
          val q = MotionPipeline.toStorageLayout(
            detect(MotionPipeline.decodeWire(stream.toDF().toDF("value")), img))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              b.write.mode("append").partitionBy("camera_id", "day").parquet(table)
            }.start()
          q.awaitTermination()
        }
        stream.addData(FrameFixtures.sequence("camA", t0, 3, moving = true) ++
          FrameFixtures.sequence("camB", t0, 2, moving = false): _*)
        runOnce()
        // wave 2 from the same checkpoint: state restored in both APIs
        stream.addData(
          FrameFixtures.frameJson("camA", t0 + 3000, FrameFixtures.PosA),
          FrameFixtures.frameJson("camB", t0 + 2000, FrameFixtures.PosB))
        runOnce()
        val rows = spark.read.parquet(table)
          .select("camera_id", "day", "frame_timestamp", "detection_type",
            "detection_count", "frame_rows", "frame_cols", "image_path")
          .collect()
          .map(r => r.toSeq.updated(7, r.getString(7).split("/").last)
            .mkString("|"))
          .sorted.toSeq
        (rows, pngs(img))
      }
      val (rowsF, pngsF) = drive("fmgws", MotionPipeline.detectBin)
      val (rowsT, pngsT) = drive("tws", MotionPipeline.detectTws)
      assert(rowsF.nonEmpty && pngsF.nonEmpty, "fixture must exercise both sinks")
      assert(rowsT == rowsF,
        s"row divergence:\n fmgws=$rowsF\n tws=$rowsT")
      assert(pngsT == pngsF, s"png divergence: fmgws=$pngsF tws=$pngsT")
    } finally prevConf.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("transformWithState path matches the flatMapGroupsWithState path") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevConf = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t0 = 1700970000000L
      val img = tmp("tws-img"); val table = tmp("tws-out"); val ckpt = tmp("tws-ckpt")
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      def runOnce(): Unit = {
        val q = MotionPipeline.toStorageLayout(
          MotionPipeline.detectTws(
            MotionPipeline.decodeWire(stream.toDF().toDF("value")), img))
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").partitionBy("camera_id", "day").parquet(table)
          }.start()
        q.awaitTermination()
      }
      stream.addData(
        FrameFixtures.frameJson("camT", t0, FrameFixtures.PosA),
        FrameFixtures.frameJson("camT", t0 + 1000, FrameFixtures.PosB))
      runOnce()
      assert(spark.read.parquet(table).count() == 2)
      assert(pngs(img) == Seq(s"camT-T-${t0 + 1000}.png"))
      // second batch via a new query from the same checkpoint: ValueState
      // restored, frame 3 diffs against frame 2
      stream.addData(FrameFixtures.frameJson("camT", t0 + 2000, FrameFixtures.PosA))
      runOnce()
      assert(spark.read.parquet(table).count() == 3)
      assert(pngs(img).length == 2)
    } finally prevConf.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("LoadReportListener captures per-batch rates and observed rows") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val listener = new LoadReportListener()
    spark.streams.addListener(listener)
    try {
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val t0 = 1700980000000L
      val q = MotionPipeline.writeResults(
        MotionPipeline.detectBin(
          MotionPipeline.decodeWire(stream.toDF().toDF("value")), tmp("lrl-img")),
        tmp("lrl-out"), tmp("lrl-ckpt"))
      stream.addData(
        FrameFixtures.frameJson("camL", t0, FrameFixtures.PosA),
        FrameFixtures.frameJson("camL", t0 + 1000, FrameFixtures.PosB))
      q.awaitTermination()
      // listener delivery is async — poll briefly
      var tries = 0
      while (listener.reports.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val withRows = listener.reports.filter(_.numInputRows > 0)
      assert(withRows.nonEmpty)
      assert(withRows.map(_.numInputRows).sum == 2)
      assert(withRows.flatMap(_.observedRows).sum == 2)
    } finally spark.streams.removeListener(listener)
  }

  test("writeResults surfaces per-batch load metrics via observe()") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val t0 = 1700960000000L
    val q = MotionPipeline.writeResults(
      MotionPipeline.detectBin(
        MotionPipeline.decodeWire(stream.toDF().toDF("value")), tmp("obs-img")),
      tmp("obs-out"), tmp("obs-ckpt"))
    stream.addData(
      FrameFixtures.frameJson("camM", t0, FrameFixtures.PosA),
      FrameFixtures.frameJson("camN", t0, FrameFixtures.PosA))
    q.awaitTermination()
    val observed = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("graft_load")))
    assert(observed.nonEmpty)
    assert(observed.map(_.getAs[Long]("rows")).sum == 2)
  }

  test("per-key isolation: cameras never see each other's previous frame") {
    val img = tmp("iso-img")
    val t0 = 1700500000000L
    // camP's square is at x=4; camQ's single frame has it at x=30. If state
    // leaked across keys, camQ would "detect motion" against camP's plane.
    val lines = Seq(
      FrameFixtures.frameJson("camP", t0, 4),
      FrameFixtures.frameJson("camQ", t0 + 500, 30),
      FrameFixtures.frameJson("camP", t0 + 1000, 4))
    import spark.implicits._
    val results = MotionPipeline.detect(
      MotionPipeline.parseFrames(lines.toDF("value")), img).collect()
    assert(results.length == 3)
    assert(pngs(img).isEmpty) // camP static; camQ has no previous frame
  }
}
