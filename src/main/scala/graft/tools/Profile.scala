package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.{FrameProducer, MotionPipeline}

/** Scratch profiler for the frame pipeline stages (dev aid, not a driver
  * contract main).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(appName = "graft-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val nCams = 4; val perCam = 75
    val wire = FrameProducer
      .toWire(FrameProducer.framesBatch(spark, nCams, perCam, 1700000000000L,
        fps = 30.0, rows = 480, cols = 640, moving = false), nCams)
      .select("value").cache()
    time("generate+cache")(wire.count())

    val img = java.nio.file.Files.createTempDirectory("profile-img").toString
    for (i <- 1 to 3) {
      time(s"decodeWire only #$i") {
        MotionPipeline.decodeWire(wire).write.format("noop").mode("overwrite").save()
      }
      time(s"from_json parse #$i") {
        MotionPipeline.parseFrames(wire).write.format("noop").mode("overwrite").save()
      }
      time(s"detectBin(decodeWire) #$i") {
        MotionPipeline.detectBin(MotionPipeline.decodeWire(wire), img)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
