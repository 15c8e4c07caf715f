package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.cv.AudioOps
import graft.sources.AudioCorpus

/** Silence-gap audio segmentation (ext119): segmentation equals the
  * constructed span structure, tolerated interior dropouts don't split,
  * amplitude scaling doesn't move boundaries, and degenerate tracks
  * (pure silence, undecodable) contribute nothing.
  */
class AudioSegmentationSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val frame = AudioSegmentation.FrameSamples

  test("segmentation equals the constructed span structure") {
    val ids = (0L until 30L).toDF("doc_id")
    val got = AudioSegmentation.segments(
      AudioCorpus.segmentedFor(ids, "doc_id"), "wav", "doc_id")
      .collect()
      .groupBy(_.getAs[Long]("id"))
    (0L until 30L).foreach { id =>
      val spans = AudioCorpus.segmentSpans(id)
      val segs = got(id).sortBy(_.getAs[Long]("seg_idx"))
      assert(segs.length == spans.size,
        s"track $id: ${segs.length} segments, want ${spans.size}")
      segs.zip(spans).zipWithIndex.foreach { case ((s, (start, len)), i) =>
        assert(s.getAs[Int]("start_frame") == start &&
          s.getAs[Int]("end_frame") == start + len - 1 &&
          s.getAs[Long]("n_voiced_frames") == len.toLong,
          s"track $id segment $i: got (${s.getAs[Int]("start_frame")}, " +
            s"${s.getAs[Int]("end_frame")}, ${s.getAs[Long]("n_voiced_frames")}), " +
            s"want ($start, ${start + len - 1}, $len)")
        val wantDur = math.rint(len.toDouble * frame / AudioCorpus.SampleRate
          * 1e6) / 1e6
        assert(s.getAs[Double]("duration_sec") == wantDur)
      }
    }
  }

  test("a one-frame interior dropout stays inside the segment; a wide gap splits") {
    def tone(frames: Int, zeroAt: Set[Int]): Array[Short] =
      Array.tabulate[Short](frames * frame) { i =>
        if (zeroAt.contains(i / frame)) 0
        else (8000 * math.sin(2 * math.Pi * 440 * (i % frame) / 8000)).toShort
      }
    val df = Seq(
      (1L, AudioOps.encodeWav(8000, 1, tone(10, Set(5)))), // 1-frame dropout
      (2L, AudioOps.encodeWav(8000, 1, tone(10, Set(4, 5, 6))))) // 3-frame gap
      .toDF("doc_id", "wav")
    val got = AudioSegmentation.segments(df, "wav", "doc_id")
      .collect().groupBy(_.getAs[Long]("id"))
    assert(got(1L).length == 1, s"dropout split: ${got(1L).mkString(",")}")
    assert(got(1L).head.getAs[Long]("n_voiced_frames") == 9L &&
      got(1L).head.getAs[Int]("end_frame") == 9)
    assert(got(2L).length == 2, s"wide gap must split: ${got(2L).mkString(",")}")
    assert(got(2L).map(r => (r.getAs[Int]("start_frame"),
      r.getAs[Int]("end_frame"))).toSet == Set((0, 3), (7, 9)))
  }

  test("amplitude scaling does not move boundaries") {
    val ids = (0L until 8L).toDF("doc_id")
    val scaled = AudioCorpus.segmentedFor(ids, "doc_id")
      .as[(Long, Array[Byte])].map { case (id, wav) =>
        val a = AudioOps.decodeWav(wav).get
        (id, AudioOps.encodeWav(a.sampleRate, a.channels,
          a.samples.map(s => (s / 4).toShort)))
      }.toDF("doc_id", "wav")
    val got = AudioSegmentation.segments(scaled, "wav", "doc_id")
      .collect().groupBy(_.getAs[Long]("id"))
    (0L until 8L).foreach { id =>
      val spans = AudioCorpus.segmentSpans(id)
      assert(got(id).length == spans.size, s"track $id under 1/4 gain")
    }
  }

  test("pure silence and undecodable tracks contribute nothing") {
    val df = Seq(
      (1L, AudioOps.encodeWav(8000, 1, new Array[Short](8 * frame))),
      (2L, Array[Byte](3, 1, 4)),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "wav")
    assert(AudioSegmentation.segments(df, "wav", "doc_id").count() == 0)
  }
}
