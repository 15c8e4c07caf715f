package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.streaming.FrameFixtures

class VideoSpec extends AnyFunSuite with SparkTestSession {

  private def clip(moving: Boolean, n: Int): Array[Byte] =
    Video.encode(FrameFixtures.Rows, FrameFixtures.Cols, 3, 30,
      (0 until n).map(i => FrameFixtures.pixels(
        if (moving && i % 2 == 1) FrameFixtures.PosB else FrameFixtures.PosA, 10)))

  test("GVID container round-trips frames exactly") {
    val frames = (0 until 3).map(i => FrameFixtures.pixels(4 + i, 10))
    val Some((r, c, ch, fps, back)) = Video.decodeFrames(
      Video.encode(FrameFixtures.Rows, FrameFixtures.Cols, 3, 30, frames))
    assert((r, c, ch, fps) == (FrameFixtures.Rows, FrameFixtures.Cols, 3, 30))
    assert(back.map(_.toSeq) == frames.map(_.toSeq))
    assert(Video.decodeFrames(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("corrupt headers whose geometry overflows Int are rejected") {
    // rows*cols = 2^32 wraps to 0 in Int math — the Long-space bound check
    // must reject instead of returning zero-length frames
    val buf = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0x47564944).putInt(65536).putInt(65536).putInt(1).putInt(30).putInt(2)
    assert(Video.decodeFrames(buf.array()).isEmpty)
    // negative dimension
    val buf2 = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf2.putInt(0x47564944).putInt(-4).putInt(4).putInt(3).putInt(30).putInt(1)
    assert(Video.decodeFrames(buf2.array()).isEmpty)
  }

  test("frames explodes per-frame rows; sampling and motion compose on top") {
    val dir = graft.ScratchDir.dir("vids")
    Files.write(Paths.get(dir, "moving.gvid"), clip(moving = true, 4))
    Files.write(Paths.get(dir, "static.gvid"), clip(moving = false, 4))
    Files.write(Paths.get(dir, "junk.gvid"), Array[Byte](7, 7))

    val all = Video.frames(Video.readVideoDir(spark, dir))
    assert(all.count() == 8) // junk dropped, 4 frames per good clip

    val sampled = Video.sampleFrames(all, 2)
    assert(sampled.count() == 4) // frames 0 and 2 of each clip

    val motion = Video.withMotion(all).collect()
      .map { r =>
        val n = if (r.isNullAt(r.fieldIndex("n_regions"))) -1
          else r.getAs[Int]("n_regions")
        (r.getAs[String]("path").split('/').last, r.getAs[Int]("frame_idx"), n)
      }
    // first frame of each clip has NULL regions (no previous frame);
    // moving clip has motion on 1..3
    assert(motion.filter(_._1 == "moving.gvid").sortBy(_._2).map(_._3).toSeq ==
      Seq(-1, 1, 1, 1))
    assert(motion.filter(_._1 == "static.gvid").sortBy(_._2).map(_._3).toSeq ==
      Seq(-1, 0, 0, 0))
  }

  test("unsupported channel counts in the header are rejected") {
    val buf = java.nio.ByteBuffer.allocate(24 + 4 * 4 * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0x47564944).putInt(4).putInt(4).putInt(2).putInt(30).putInt(1)
    assert(Video.decodeFrames(buf.array()).isEmpty) // 2-channel: no CV layout
  }
}
