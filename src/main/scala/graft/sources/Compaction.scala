package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for the streaming results table.
  *
  * Every micro-batch of the foreachBatch sink appends a handful of files
  * per (camera_id, day) partition; after days of 60 s batches a partition
  * holds thousands of KB-sized files and scan planning dominates query
  * time — the classic streaming small-file problem. Compaction rewrites
  * each partition's rows into ~`targetFileBytes` files.
  *
  * Uses dynamic partition overwrite so ONLY partitions present in the
  * rewritten data are replaced — an untouched partition (e.g. today's,
  * still being appended) keeps its files, and the rewrite of historical
  * partitions is atomic per partition.
  */
object Compaction {

  /** Rewrite partitions older than `beforeDay` (exclusive, yyyy-MM-dd) into
    * right-sized files. Returns the number of rows rewritten.
    */
  def compactResults(
      spark: SparkSession, tableDir: String, beforeDay: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val old = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val toCompact = spark.read.parquet(tableDir).where(col("day") < beforeDay)
      val rows = toCompact.count()
      if (rows > 0) {
        // estimate output file count from input bytes (parquet in ≈ out)
        val inputBytes = toCompact.inputFiles
          .map(f => new java.io.File(new java.net.URI(f)).length()).sum
        val nFiles = math.max(1, (inputBytes / targetFileBytes).toInt)
        toCompact
          .repartition(nFiles, col("camera_id"), col("day"))
          .write.mode("overwrite")
          .partitionBy("camera_id", "day")
          .parquet(tableDir)
      }
      rows
    } finally {
      old.fold(spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    }
  }
}
