package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.cv.{ImageOps, Png}
import graft.streaming.FrameFixtures

/** Multimodal image columns: binaryFile read-back of pipeline PNGs, exact
  * decode round-trip (PNG is lossless), resize geometry, features, and
  * filename-keyed frame sampling.
  */
class ImagesSpec extends AnyFunSuite with SparkTestSession {

  private def writeFrames(dir: String, cam: String, n: Int): Unit =
    (0 until n).foreach { i =>
      Png.saveFrame(FrameFixtures.pixels(4 + i, 10),
        FrameFixtures.Rows, FrameFixtures.Cols, 3, cam, 1700800000000L + i * 1000L, dir)
    }

  test("binaryFile source + decode round-trips pipeline PNGs exactly") {
    val dir = graft.ScratchDir.dir("imgs")
    writeFrames(dir, "camA", 3)
    val decoded = Images.decoded(Images.readPngDir(spark, dir)).collect()
    assert(decoded.length == 3)
    decoded.foreach { r =>
      assert(r.getAs[Int]("rows") == FrameFixtures.Rows)
      assert(r.getAs[Int]("cols") == FrameFixtures.Cols)
      assert(r.getAs[Int]("channels") == 3)
    }
    // exact pixel round-trip for a known frame
    val one = decoded.map(r => (r.getAs[String]("path"), r.getAs[Array[Byte]]("px")))
      .find(_._1.endsWith("camA-T-1700800000000.png")).get._2
    assert(one.toSeq == FrameFixtures.pixels(4, 10).toSeq)
  }

  test("undecodable binaries are dropped") {
    val dir = graft.ScratchDir.dir("imgs-bad")
    Files.write(java.nio.file.Paths.get(dir, "junk.png"), Array[Byte](1, 2, 3))
    writeFrames(dir, "camB", 1)
    assert(Images.decoded(Images.readPngDir(spark, dir)).count() == 1)
  }

  test("resize halves geometry; uniform regions stay uniform") {
    val px = Array.fill(32 * 32 * 3)(100.toByte)
    val out = ImageOps.resizeBilinear(px, 32, 32, 3, 16, 16)
    assert(out.length == 16 * 16 * 3)
    assert(out.forall(_ == 100.toByte))
    val dir = graft.ScratchDir.dir("imgs-rs")
    writeFrames(dir, "camC", 1)
    val row = Images.withResized(
      Images.decoded(Images.readPngDir(spark, dir)), 24, 24).collect().head
    assert(row.getAs[Array[Byte]]("px_resized").length == 24 * 24 * 3)
  }

  test("features: uniform image has zero std and edges; square adds both") {
    val flat = Array.fill(48 * 48 * 3)(10.toByte)
    val (m0, s0, e0) = ImageOps.features(flat, 48, 48, 3)
    assert(math.abs(m0 - 10.0) < 1e-9 && s0 == 0.0 && e0 == 0.0)
    val (m1, s1, e1) = ImageOps.features(FrameFixtures.pixels(4, 10), 48, 48, 3)
    assert(m1 > m0 && s1 > 0 && e1 > 0)
  }

  test("sampleFrames keeps every nth frame per camera in time order") {
    val dir = graft.ScratchDir.dir("imgs-smp")
    writeFrames(dir, "camD", 6)
    writeFrames(dir, "camE", 3)
    // a stray PNG without the -T-{ms} pattern must be ignored, not abort
    // the job on the ANSI cast of a failed regexp_extract
    Files.write(java.nio.file.Paths.get(dir, "cover.png"), Array[Byte](1, 2, 3))
    val kept = Images.sampleFrames(Images.readPngDir(spark, dir), everyNth = 2)
      .select("camera_id", "epoch_ms").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(kept == Seq(
      ("camD", 1700800000000L), ("camD", 1700800002000L), ("camD", 1700800004000L),
      ("camE", 1700800000000L), ("camE", 1700800002000L)))
  }
}
