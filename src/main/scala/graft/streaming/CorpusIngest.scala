package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.TextFunctions

/** Streaming corpus ingestion: the LLM-data-pipeline counterpart of the
  * frame pipeline (SURVEY.md §2.7). Documents arrive continuously as JSONL,
  * are parsed with drop-on-malformed semantics (the same
  * PERMISSIVE-with-drop contract as the frame wire,
  * `/root/reference/dvaf/processor/.../VideoProcessor.java:143-153`),
  * quality-scored and gated map-side, exact-deduped on a content digest
  * within a watermark, and appended to a source-partitioned table.
  *
  * Scale design: parse/score/gate are stateless map work; the only state is
  * the dedup digest store, which the watermark bounds — a digest older than
  * `watermarkDelay` is evicted, so state size tracks the ingest rate × the
  * replay horizon, not the corpus (full-history exact dedup is the batch
  * job, [[graft.operators.Dedup.exact]]; this is the at-ingest guard that
  * keeps replayed/duplicate deliveries out of the landing table).
  */
object CorpusIngest {

  /** Wire schema for one JSONL document record. */
  val wireSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, text STRING, source STRING, ingest_ts TIMESTAMP")

  /** Parse the raw `value` lines; malformed JSON or records missing the
    * required fields drop (null-filter), matching the frame path's
    * contract.
    */
  def parse(lines: DataFrame): DataFrame =
    lines
      .select(from_json(col("value"), wireSchema).as("d"))
      .select("d.*")
      .filter(col("doc_id").isNotNull && col("text").isNotNull &&
        col("source").isNotNull && col("ingest_ts").isNotNull)

  /** Score, gate, and dedup: keeps documents with at least `minTokens`
    * tokens and a distinct-token ratio of at least `minDistinctRatio`,
    * then drops any document whose md5 digest was already seen within the
    * watermark window. Works identically on batch frames (dedup falls back
    * to plain dropDuplicates — batch has the whole input).
    */
  def prepare(
      docs: DataFrame,
      minTokens: Int = 5,
      minDistinctRatio: Double = 0.2,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val feats = TextFunctions.qualityFeatures(col("text")).toMap
    val gated = docs
      .withColumn("n_tokens", feats("n_tokens"))
      .withColumn("distinct_ratio", feats("distinct_ratio"))
      .filter(col("n_tokens") >= minTokens && col("distinct_ratio") >= minDistinctRatio)
      .withColumn("digest", md5(col("text")))
    if (gated.isStreaming)
      gated
        .withWatermark("ingest_ts", watermarkDelay)
        .dropDuplicatesWithinWatermark("digest")
    else
      gated.dropDuplicates("digest")
  }

  /** Append the prepared stream to a source-partitioned parquet table —
    * the corpus analog of the frame sink's (camera_id, day) layout.
    */
  def writeCorpus(
      prepared: DataFrame, table: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    prepared.writeStream
      .partitionBy("source")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", table)
      .start()

  /** End-to-end convenience over a JSONL directory. The default
    * `AvailableNow` trigger DRAINS the currently-present files and stops
    * (the batch-ingest shape the specs and bench use); pass a processing-
    * time trigger to actually watch the directory continuously.
    */
  def runStream(
      spark: SparkSession, inDir: String, table: String, checkpoint: String,
      minTokens: Int = 5, minDistinctRatio: Double = 0.2,
      watermarkDelay: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val lines = spark.readStream.schema("value STRING").text(inDir)
    writeCorpus(
      prepare(parse(lines), minTokens, minDistinctRatio, watermarkDelay),
      table, checkpoint, trigger)
  }
}
