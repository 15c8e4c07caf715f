package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.cv.{AudioOps, Png}
import graft.sources.{AudioCorpus, ImageCorpus, Video, VideoCorpus}

/** Multimodal quality gates (ext113 image / ext114 audio / ext115 video):
  * verdicts equal the graded corpora's constructed failure classes, the
  * stats are exact on hand-computable fixtures, and the video summary
  * cross-checks shot segmentation (static transitions == non-cuts).
  */
class MediaQualitySpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def expectedImageReason(id: Long): Option[String] = (id % 5) match {
    case 0 => None
    case 1 => Some("low_contrast")
    case 2 => Some("blurred")
    case 3 => Some("too_dark")
    case _ => Some("too_small")
  }

  test("image verdicts equal the graded corpus's failure classes") {
    val ids = (0L until 50L).toDF("doc_id")
    val got = MediaQuality.imageVerdicts(
      MediaQuality.imageStats(
        ImageCorpus.gradedFor(ids, "doc_id"), "png", "doc_id"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("keep"), Option(r.getAs[String]("reason")))).toMap
    assert(got.size == 50)
    (0L until 50L).foreach { id =>
      val want = expectedImageReason(id)
      assert(got(id) == (want.isEmpty, want),
        s"image $id (grade ${id % 5}): got ${got(id)}, want $want")
    }
  }

  test("the gate SCALARS equal the batch verdict pipeline on arbitrary corpus content") {
    // the streaming gates (imageReasonOf/audioReasonOf) re-derive the
    // batch rules from raw bytes with their own 6-dp rounding — this
    // sweep pins them verdict-for-verdict against the full batch
    // stats→verdicts pipeline across every corpus family we have
    // (graded, dedup, funnel, track), not just the graded classes the
    // ingest specs use, so a rounding-edge drift cannot hide
    val imgBytes: Seq[(Long, Array[Byte])] =
      (0L until 25L).map(i => i -> ImageCorpus.renderGraded(i)) ++
      (100L until 115L).map(i => i -> ImageCorpus.render(i - 100L)) ++
      (200L until 210L).map(i => i -> ImageCorpus.renderFunnel(i - 200L))
    val imgDf = imgBytes.toDF("doc_id", "png")
    val batchImg = MediaQuality.imageVerdicts(
      MediaQuality.imageStats(imgDf, "png", "doc_id"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("reason"))).toMap
    imgBytes.foreach { case (id, bytes) =>
      assert(MediaQuality.imageReasonOf(bytes) == batchImg(id),
        s"image $id: scalar ${MediaQuality.imageReasonOf(bytes)} vs " +
          s"batch ${batchImg(id)}")
    }
    // the standalone COLUMN form must agree too (three forms, one gate)
    val colImg = imgDf.select($"doc_id",
      MediaQuality.imageQualityReason($"png").as("r"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(colImg == batchImg, s"column form drifted: $colImg vs $batchImg")
    val audBytes: Seq[(Long, Array[Byte])] =
      (0L until 25L).map(i => i -> AudioCorpus.renderGraded(i)) ++
      (100L until 115L).map(i => i -> AudioCorpus.render(i - 100L)) ++
      (200L until 206L).map(i => i -> AudioCorpus.renderTrack(i - 200L))
    val audDf = audBytes.toDF("doc_id", "wav")
    val batchAud = MediaQuality.audioVerdicts(
      MediaQuality.audioStats(audDf, "wav", "doc_id"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("reason"))).toMap
    audBytes.foreach { case (id, bytes) =>
      assert(MediaQuality.audioReasonOf(bytes) == batchAud(id),
        s"audio $id: scalar ${MediaQuality.audioReasonOf(bytes)} vs " +
          s"batch ${batchAud(id)}")
    }
    val colAud = audDf.select($"doc_id",
      MediaQuality.audioQualityReason($"wav").as("r"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(colAud == batchAud, s"column form drifted: $colAud vs $batchAud")
  }

  test("the blurred grade fails sharpness while KEEPING healthy contrast") {
    val ids = (0L until 50L).toDF("doc_id")
    val blurred = MediaQuality.imageStats(
      ImageCorpus.gradedFor(ids, "doc_id"), "png", "doc_id")
      .filter($"id" % 5 === 2).collect()
    assert(blurred.nonEmpty)
    blurred.foreach { r =>
      assert(r.getAs[Double]("contrast") >= 8.0,
        s"image ${r.getAs[Long]("id")}: blur should not crush contrast " +
          s"(got ${r.getAs[Double]("contrast")})")
      assert(r.getAs[Double]("sharpness") < 8.0,
        s"image ${r.getAs[Long]("id")}: blur should crush RMS gradient " +
          s"(got ${r.getAs[Double]("sharpness")})")
    }
  }

  test("image stats are exact on hand-computable fixtures; undecodable flagged") {
    val flat = {
      val px = Array.fill[Byte](16 * 16 * 3)(100.toByte)
      Png.encodeBytes(px, 16, 16, 3)
    }
    val stripes = { // vertical 0/255 stripes of width 1, 16x16
      val px = new Array[Byte](16 * 16 * 3)
      for (r <- 0 until 16; c <- 0 until 16; k <- 0 until 3)
        px((r * 16 + c) * 3 + k) = (if (c % 2 == 0) 0 else 255).toByte
      Png.encodeBytes(px, 16, 16, 3)
    }
    val rows = Seq((1L, flat), (2L, stripes), (3L, Array[Byte](1, 2, 3)),
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "png")
    val got = MediaQuality.imageStats(rows, "png", "doc_id")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val f = got(1L)
    assert(f.getAs[Boolean]("decodable"))
    assert(f.getAs[Double]("mean_luma") == 100.0 &&
      f.getAs[Double]("contrast") == 0.0 &&
      f.getAs[Double]("sharpness") == 0.0 &&
      f.getAs[Double]("entropy") == 0.0)
    val s = got(2L)
    // stripes: mean 127.5; std 127.5; horizontal diffs all 255 and
    // vertical all 0, equal pair counts -> rms = 255/sqrt(2); entropy 1 bit
    assert(s.getAs[Double]("mean_luma") == 127.5)
    assert(s.getAs[Double]("contrast") == 127.5)
    assert(math.abs(s.getAs[Double]("sharpness") - 255.0 / math.sqrt(2)) < 1e-4)
    assert(s.getAs[Double]("entropy") == 1.0)
    assert(!got(3L).getAs[Boolean]("decodable") && !got(4L).getAs[Boolean]("decodable"))
    val verdicts = MediaQuality.imageVerdicts(
      MediaQuality.imageStats(rows, "png", "doc_id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("reason")).toMap
    assert(verdicts(3L) == "undecodable" && verdicts(4L) == "undecodable")
  }

  private def expectedAudioReason(id: Long): Option[String] = (id % 5) match {
    case 0 => None
    case 1 => Some("near_silent")
    case 2 => Some("clipped")
    case 3 => Some("mostly_silent")
    case _ => Some("too_short")
  }

  test("audio verdicts equal the graded corpus's failure classes") {
    val ids = (0L until 50L).toDF("doc_id")
    val got = MediaQuality.audioVerdicts(
      MediaQuality.audioStats(
        AudioCorpus.gradedFor(ids, "doc_id"), "wav", "doc_id"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("keep"), Option(r.getAs[String]("reason")))).toMap
    (0L until 50L).foreach { id =>
      val want = expectedAudioReason(id)
      assert(got(id) == (want.isEmpty, want),
        s"track $id (grade ${id % 5}): got ${got(id)}, want $want")
    }
  }

  test("the mostly-silent grade passes track RMS but fails frame-level silence") {
    val ids = (0L until 50L).toDF("doc_id")
    val rows = MediaQuality.audioStats(
      AudioCorpus.gradedFor(ids, "doc_id"), "wav", "doc_id")
      .filter($"id" % 5 === 3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("rms") >= 0.01,
        s"track ${r.getAs[Long]("id")}: whole-track RMS should pass")
      assert(r.getAs[Double]("silence_ratio") > 0.5,
        s"track ${r.getAs[Long]("id")}: frame silence should fail")
    }
  }

  test("audio stats are exact on constructed fixtures; stereo duration") {
    val zeros = AudioOps.encodeWav(8000, 1, new Array[Short](8000))
    val square = AudioOps.encodeWav(8000, 1,
      Array.tabulate[Short](8000)(i => if (i % 2 == 0) 32767 else -32768))
    val stereo = AudioOps.encodeWav(8000, 2,
      Array.tabulate[Short](16000)(i => (1000 * math.sin(i / 10.0)).toShort))
    val rows = Seq((1L, zeros), (2L, square), (3L, stereo),
      (4L, Array[Byte](9, 9)))
      .toDF("doc_id", "wav")
    val got = MediaQuality.audioStats(rows, "wav", "doc_id")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(got(1L).getAs[Double]("rms") == 0.0 &&
      got(1L).getAs[Double]("silence_ratio") == 1.0 &&
      got(1L).getAs[Double]("clipping_ratio") == 0.0 &&
      got(1L).getAs[Double]("duration_sec") == 1.0)
    assert(got(2L).getAs[Double]("clipping_ratio") == 1.0 &&
      got(2L).getAs[Double]("rms") > 0.99 &&
      got(2L).getAs[Double]("silence_ratio") == 0.0)
    // 16000 interleaved samples / 2 channels / 8000 Hz = 1 s
    assert(got(3L).getAs[Double]("duration_sec") == 1.0)
    assert(!got(4L).getAs[Boolean]("decodable"))
  }

  test("video stats cross-check the scene structure: static == non-cut transitions") {
    val ids = (0L until 10L).toDF("doc_id")
    val frames = Video.framesById(
      VideoCorpus.scenesFor(ids, "doc_id"), "gvid", "doc_id")
    val got = MediaQuality.videoStats(frames)
      .collect().map(r => r.getAs[Long]("video_id") -> r).toMap
    (0L until 10L).foreach { id =>
      val lens = VideoCorpus.sceneLengths(id)
      val n = lens.sum
      val cuts = lens.size - 1
      val r = got(id)
      assert(r.getAs[Long]("n_frames") == n.toLong)
      assert(r.getAs[Int]("width") == VideoCorpus.Side &&
        r.getAs[Int]("height") == VideoCorpus.Side)
      val wantStatic =
        math.rint((n - 1 - cuts).toDouble / (n - 1) * 1e6) / 1e6
      assert(r.getAs[Double]("static_ratio") == wantStatic,
        s"video $id: static ${r.getAs[Double]("static_ratio")}, want $wantStatic")
      assert(r.getAs[Double]("low_info_ratio") == 0.0,
        s"video $id: block noise frames must all be informative")
    }
  }

  test("the image quality gate runs unchanged under Structured Streaming (stateless map-side)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Long]
    in.addData(0L until 10L: _*)
    val q = MediaQuality.imageVerdicts(
      MediaQuality.imageStats(
        ImageCorpus.gradedFor(in.toDF.withColumnRenamed("value", "doc_id"),
          "doc_id"),
        "png", "doc_id"))
      .writeStream.format("memory").queryName("mq_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("mq_stream").collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("reason"))).toMap
    assert(got.size == 10)
    (0L until 10L).foreach { id =>
      assert(got(id) == expectedImageReason(id),
        s"stream verdict($id): got ${got(id)}")
    }
  }

  test("black frames count as low-information; identical frames as static") {
    // 4 black frames then 4 copies of one noise frame: low_info 4/8,
    // static transitions = 3 (black->black) + 3 (noise->noise) of 7
    val noise = Array.tabulate[Byte](32 * 32 * 3) { i =>
      (((i / 3) * 2654435761L >>> 7) & 0xff).toByte
    }
    val black = new Array[Byte](32 * 32 * 3)
    val gvid = Video.encode(32, 32, 3, fps = 10,
      Seq.fill(4)(black) ++ Seq.fill(4)(noise))
    val got = MediaQuality.videoStats(
      Video.framesById(Seq((7L, gvid)).toDF("doc_id", "gvid"), "gvid", "doc_id"))
      .collect().head
    assert(got.getAs[Long]("n_frames") == 8L)
    assert(got.getAs[Double]("low_info_ratio") == 0.5)
    val wantStatic = math.rint(6.0 / 7 * 1e6) / 1e6
    assert(got.getAs[Double]("static_ratio") == wantStatic)
  }
}
