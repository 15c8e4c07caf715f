package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for the streaming results table.
  *
  * Every micro-batch of the foreachBatch sink appends a handful of files
  * per (camera_id, day) partition; after days of 60 s batches a partition
  * holds thousands of KB-sized files and scan planning dominates query
  * time — the classic streaming small-file problem. Compaction rewrites
  * each historical partition's rows into ~`targetFileBytes` files.
  *
  * Uses dynamic partition overwrite so ONLY partitions present in the
  * rewritten data are replaced — an untouched partition (e.g. today's,
  * still being appended) keeps its files.
  *
  * CONCURRENCY CONTRACT: plain parquet directories have no transaction
  * log, so a file appended into a partition between this job's scan and
  * its overwrite commit is silently deleted. The rewrite is therefore only
  * safe for partitions the sink can no longer touch. Because the sink
  * partitions by EVENT-time day, "can no longer touch" is a watermark
  * statement, not a wall-clock one: late rows land in old (camera_id, day)
  * partitions until the stream's watermark passes them. Derive the cutoff
  * with [[safeCutoffDay]] from the query's current watermark (or quiesce
  * the sink for the duration); anything more concurrent needs a
  * transactional table format.
  */
object Compaction {

  /** Latest day (yyyy-MM-dd, UTC) that is safe to compact under a stream
    * whose event-time watermark is at `watermarkMs`: every day strictly
    * before the returned value ended at least `safetyMarginMs` before the
    * watermark, so the sink can never again append to it (Spark drops
    * later-than-watermark rows before the state/sink stage). Pass the
    * `watermark` field of the query's last `StreamingQueryProgress`.
    */
  def safeCutoffDay(watermarkMs: Long, safetyMarginMs: Long = 6L * 3600 * 1000): String =
    java.time.Instant.ofEpochMilli(math.max(0L, watermarkMs - safetyMarginMs))
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  /** Rewrite partitions older than `beforeDay` (exclusive, yyyy-MM-dd) into
    * right-sized files. Returns the number of rows rewritten.
    *
    * `beforeDay` must respect the watermark contract above; when
    * `watermarkMs` is supplied the cutoff is clamped to
    * [[safeCutoffDay]] automatically, making a too-eager caller safe.
    */
  def compactResults(
      spark: SparkSession, tableDir: String, beforeDay: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      watermarkMs: Option[Long] = None,
      safetyMarginMs: Long = 6L * 3600 * 1000): Long = {
    val cutoff = watermarkMs match {
      case Some(wm) =>
        val safe = safeCutoffDay(wm, safetyMarginMs)
        if (safe < beforeDay) safe else beforeDay
      case None => beforeDay
    }
    val old = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // size the partitions being rewritten FIRST, through the Hadoop FS
      // API (works on hdfs/s3a/..., unlike java.io.File): metadata-only, so
      // the nothing-to-do case costs no data scan, and the rewrite below is
      // the ONLY read of the data (the row count rides along via observe()
      // instead of a separate count() job re-scanning every old partition).
      val (targetBytes, nPartitions) = partitionSizes(spark, tableDir, cutoff)
      if (nPartitions == 0) return 0L
      val filesPerPartition =
        math.max(1, math.ceil(targetBytes.toDouble /
          math.max(1, nPartitions) / targetFileBytes).toInt)
      val obs = org.apache.spark.sql.Observation()
      // rows with equal (camera_id, day) hash to one task — a salt lets a
      // big partition split across `filesPerPartition` writers. The
      // partition count is explicit: AQE would otherwise coalesce the
      // shuffle and undo the split.
      spark.read.parquet(tableDir).where(col("day") < cutoff)
        .observe(obs, count(lit(1)).as("rows"))
        .withColumn("__salt", (rand(7L) * filesPerPartition).cast("int"))
        .repartition(nPartitions * filesPerPartition,
          col("camera_id"), col("day"), col("__salt"))
        .drop("__salt")
        .write.mode("overwrite")
        .partitionBy("camera_id", "day")
        .parquet(tableDir)
      obs.get("rows").asInstanceOf[Long]
    } finally {
      old.fold(spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    }
  }

  /** (total bytes, partition count) of the camera-day partition directories
    * with day < beforeDay.
    */
  private def partitionSizes(
      spark: SparkSession, tableDir: String, beforeDay: String): (Long, Int) = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val dayDirs = fs.globStatus(new Path(root, "camera_id=*/day=*"))
    var bytes = 0L
    var n = 0
    if (dayDirs != null) dayDirs.foreach { st =>
      val day = st.getPath.getName.stripPrefix("day=")
      if (st.isDirectory && day < beforeDay) {
        n += 1
        bytes += fs.getContentSummary(st.getPath).getLength
      }
    }
    (bytes, n)
  }
}
