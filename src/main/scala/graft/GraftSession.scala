package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended scale configuration.
  *
  * These are the knobs that define the 100 TB envelope (SURVEY.md §4):
  * AQE for runtime re-planning (coalescing + skew-join splitting), shuffle
  * partition count sized to the cluster (32 here = local[32] stand-in; on a
  * real cluster ≈ 2-3× total cores), bounded file-split size so scan tasks
  * fit executor memory, and the RocksDB state store so streaming state
  * (per-camera planes, dedup keys, window buffers) spills off-heap instead
  * of growing the JVM heap.
  */
object GraftSession {

  def builder(
      master: String = "local[32]",
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128 * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (32 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events table
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")

  def create(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    GraftFunctions.register(spark) // idempotent; covers pre-existing sessions
    functions.MotionSummary.register(spark)
    spark
  }
}
