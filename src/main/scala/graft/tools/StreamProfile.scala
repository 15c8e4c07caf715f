package graft.tools

import org.apache.spark.sql.DataFrame

import graft.streaming.{FrameProducer, MotionPipeline}

/** Dev aid (not a driver contract main): attributes the e2e streaming
  * bench's cost across source / state store / sink variants, because the
  * headline `streaming_fps_e2e` mixes micro-batch planning, RocksDB state
  * commits and the foreachBatch parquet sink into one number.
  *
  *   sbt "runMain graft.tools.StreamProfile"
  *
  * Prints one line per variant: median-of-3 seconds for the same
  * 4-cam × 150-frame AvailableNow run Bench times.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", cpus.toInt, appName = "graft-stream-profile")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nCams = 4
    val perCam = 150
    val base = java.nio.file.Files.createTempDirectory("stream-profile")
    val wireDir = s"$base/wire"
    FrameProducer
      .toWire(FrameProducer.framesBatch(spark, nCams, perCam, 1700000000000L,
        fps = 30.0, rows = 480, cols = 640, moving = false), nCams)
      .select("value").write.text(wireDir)

    var n = 0
    def timed(tag: String)(sink: (DataFrame, String) => Unit): Unit = {
      def run(): Double = {
        n += 1
        val dir = s"$base/run-$n"
        val stream = spark.readStream.schema("value STRING").text(wireDir)
        val results = MotionPipeline.detectBin(
          MotionPipeline.decodeWire(stream), s"$dir/img")
        val t0 = System.nanoTime()
        sink(MotionPipeline.toStorageLayout(results), dir)
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      val secs = (1 to 3).map(_ => run()).sorted.apply(1)
      println(f"[stream-profile] $tag: $secs%.2f s  (${nCams * perCam / secs}%.1f fps)")
    }

    def start(out: DataFrame, dir: String)(
        write: DataFrame => Unit): Unit =
      out.writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: DataFrame, _: Long) => write(b))
        .start().awaitTermination()

    timed("baseline: parquet partitionBy sink") { (out, dir) =>
      start(out, dir)(_.write.mode("append")
        .partitionBy("camera_id", "day").parquet(s"$dir/table"))
    }
    timed("noop foreachBatch (source+state only)") { (out, dir) =>
      start(out, dir)(_.write.format("noop").mode("overwrite").save())
    }
    timed("count-only foreachBatch") { (out, dir) =>
      start(out, dir)(b => { b.count(); () })
    }
    timed("parquet sink, no partitionBy") { (out, dir) =>
      start(out, dir)(_.write.mode("append").parquet(s"$dir/table"))
    }
    timed("parquet partitionBy after repartition(partition cols)") { (out, dir) =>
      start(out, dir)(_.repartition(org.apache.spark.sql.functions.col("camera_id"),
          org.apache.spark.sql.functions.col("day"))
        .write.mode("append").partitionBy("camera_id", "day").parquet(s"$dir/table"))
    }

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    timed("HDFS state store, parquet partitionBy sink") { (out, dir) =>
      start(out, dir)(_.write.mode("append")
        .partitionBy("camera_id", "day").parquet(s"$dir/table"))
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    spark.conf.set("spark.sql.shuffle.partitions", "8")
    timed("8 shuffle/state partitions, parquet partitionBy sink") { (out, dir) =>
      start(out, dir)(_.write.mode("append")
        .partitionBy("camera_id", "day").parquet(s"$dir/table"))
    }
    timed("8 partitions + repartition(partition cols) sink") { (out, dir) =>
      start(out, dir)(_.repartition(org.apache.spark.sql.functions.col("camera_id"),
          org.apache.spark.sql.functions.col("day"))
        .write.mode("append").partitionBy("camera_id", "day").parquet(s"$dir/table"))
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)

    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    timed("RocksDB changelog checkpointing, parquet partitionBy sink") { (out, dir) =>
      start(out, dir)(_.write.mode("append")
        .partitionBy("camera_id", "day").parquet(s"$dir/table"))
    }
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "false")

    spark.stop()
  }
}
