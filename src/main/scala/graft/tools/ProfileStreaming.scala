package graft.tools

/** Phase profiler for the streaming hot path (dev aid, like [[Plans]]):
  * measures per-frame cost of (a) wire-JSON parse+base64 decode and (b) the
  * fused kernel chain pure-JVM, then the Spark-side phase breakdown
  * (scan / decode / shuffle / full detect) at the bench geometry
  * (4 cams × 75 frames of 640×480×3, static scene).
  * Run: sbt "runMain graft.tools.ProfileStreaming"
  */
object ProfileStreaming {
  def main(args: Array[String]): Unit = {
    val rows = 480; val cols = 640
    val n = 150
    val factory = new com.fasterxml.jackson.core.JsonFactory()

    // build wire JSON like FrameProducer.toWire
    val wires = (0 until n).map { i =>
      val px = graft.streaming.FrameProducer.synthPixels(i.toLong, rows, cols, moving = false)
      val b64 = java.util.Base64.getEncoder.encodeToString(px)
      s"""{"camId":"cam0","timestamp":"2024-01-01T00:00:${f"${i % 60}%02d"}.000Z","rows":$rows,"cols":$cols,"type":16,"data":"$b64"}"""
    }.toArray

    def time[A](label: String, reps: Int)(f: Int => A): Unit = {
      // warm
      (0 until reps).foreach(f)
      val t0 = System.nanoTime()
      (0 until reps).foreach(f)
      val ms = (System.nanoTime() - t0) / 1e6 / reps
      println(f"$label%-28s ${ms}%8.2f ms/frame")
    }

    time("json parse+b64 decode", n) { i =>
      graft.streaming.WireCodecAccess.decode(factory, wires(i))
    }

    val planes = (0 until n).map { i =>
      graft.streaming.FrameProducer.synthPixels(i.toLong, rows, cols, moving = false)
    }.toArray
    val gray = new Array[Byte](rows * cols)
    val tmp = new Array[Int](rows * cols)
    val blurA = new Array[Byte](rows * cols)
    val blurB = new Array[Byte](rows * cols)
    val bin = new Array[Byte](rows * cols)
    val labels = new Array[Boolean](rows * cols)
    val stack = new java.util.ArrayDeque[Int]()

    time("grayscaleInto", n) { i =>
      graft.cv.Kernels.grayscaleInto(planes(i), rows, cols, 3, gray)
    }
    time("gaussianBlur3x3Into", n) { i =>
      graft.cv.Kernels.gaussianBlur3x3Into(gray, rows, cols, tmp, if (i % 2 == 0) blurA else blurB)
    }
    time("absDiffThresholdInto", n) { _ =>
      graft.cv.Kernels.absDiffThresholdInto(blurA, blurB, 20, bin)
    }
    time("boundingBoxesReuse", n) { _ =>
      graft.cv.Kernels.boundingBoxesReuse(bin, rows, cols, 300, labels, stack)
    }
    time("full kernel chain", n) { i =>
      graft.cv.Kernels.grayscaleInto(planes(i), rows, cols, 3, gray)
      graft.cv.Kernels.gaussianBlur3x3Into(gray, rows, cols, tmp, blurA)
      graft.cv.Kernels.absDiffThresholdInto(blurA, blurB, 20, bin)
      graft.cv.Kernels.boundingBoxesReuse(bin, rows, cols, 300, labels, stack)
    }

    // ---- Spark-side phase breakdown at the bench shape (4 cams × 75)
    val spark = graft.GraftSession.builder("local[32]", 32, "profile").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.{FrameProducer, MotionPipeline}
    val wire = FrameProducer
      .toWire(FrameProducer.framesBatch(spark, 4, 75, 1700000000000L,
        fps = 30.0, rows = 480, cols = 640, moving = false), 4)
      .select("value").cache()
    wire.count()
    val img = java.nio.file.Files.createTempDirectory("prof-img").toString

    def stime(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e6}%8.1f ms total (300 frames)")
    }

    stime("scan cache only") {
      wire.write.format("noop").mode("overwrite").save()
    }
    stime("decode -> noop") {
      MotionPipeline.decodeWire(wire).write.format("noop").mode("overwrite").save()
    }
    stime("decode -> shuffle -> count") {
      import spark.implicits._
      MotionPipeline.decodeWire(wire)
        .groupByKey(_.camId).mapGroups((k, it) => (k, it.size))
        .write.format("noop").mode("overwrite").save()
    }
    stime("full detectBin") {
      MotionPipeline.detectBin(MotionPipeline.decodeWire(wire), img)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
