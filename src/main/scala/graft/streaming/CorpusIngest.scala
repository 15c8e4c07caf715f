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

  /** The stateless gate verdicts — every parsed doc plus `reject_reason`
    * (null = pass) and contamination evidence. Reasons, in rule order:
    * the text quality gate ([[TextFunctions.qualityReason]] — empty /
    * too_few_tokens / repetitive, the same scalar the near-dup
    * suppressor's gate runs), then "contaminated" when a `watchlist`
    * (the ext126/ext127 [[graft.operators.ContaminationGuard]] broadcast
    * index — decontamination AT THE DOOR, so a leaked eval excerpt never
    * lands in the corpus and never occupies a dedup digest slot) is given
    * and the doc holds any benchmark window; `bench_id`/`match_pos` carry
    * the first hit's evidence (the full island story is one
    * `ContaminationGuard.flag` call over the bounded rejects, never the
    * corpus). The probe's hashing scan only runs on quality-passers —
    * the quality verdict is passed INTO the probe UDF as its guard
    * (`withHit(guard = …)`), because a CASE wrapper around a fenced
    * nondeterministic UDF masks the result without skipping the work.
    * All map-side; identical on a stream and a batch frame.
    */
  def gateVerdicts(
      docs: DataFrame,
      minTokens: Int = 5,
      minDistinctRatio: Double = 0.2,
      watchlist: Option[graft.operators.ContaminationGuard.BenchIndex] = None): DataFrame = {
    val feats = TextFunctions.qualityFeatures(col("text")).toMap
    val scored = docs
      .withColumn("n_tokens", feats("n_tokens"))
      .withColumn("distinct_ratio", feats("distinct_ratio"))
      .withColumn("digest", md5(col("text")))
      .withColumn("__q_reason",
        TextFunctions.qualityReason(col("text"), minTokens, minDistinctRatio))
    val probed = watchlist match {
      case None => scored.withColumn("contamination",
        lit(null).cast("struct<bench_id:bigint,match_pos:bigint>"))
      case Some(idx) =>
        graft.operators.ContaminationGuard.withHit(
          scored, "text", idx, outCol = "contamination",
          guard = col("__q_reason").isNull)
    }
    probed
      .withColumn("reject_reason",
        coalesce(col("__q_reason"),
          when(col("contamination").isNotNull, "contaminated")))
      .withColumn("bench_id", col("contamination.bench_id"))
      .withColumn("match_pos", col("contamination.match_pos"))
      .drop("__q_reason", "contamination")
  }

  /** Score, gate, and dedup: keeps documents with at least `minTokens`
    * tokens and a distinct-token ratio of at least `minDistinctRatio`
    * (plus, when a `watchlist` is given, no benchmark-window hit —
    * [[gateVerdicts]]), then drops any document whose md5 digest was
    * already seen within the watermark window. Works identically on batch
    * frames (dedup falls back to plain dropDuplicates — batch has the
    * whole input).
    */
  def prepare(
      docs: DataFrame,
      minTokens: Int = 5,
      minDistinctRatio: Double = 0.2,
      watermarkDelay: String = "10 minutes",
      watchlist: Option[graft.operators.ContaminationGuard.BenchIndex] = None): DataFrame =
    dedupByDigest(
      gateVerdicts(docs, minTokens, minDistinctRatio, watchlist)
        .filter(col("reject_reason").isNull)
        .drop("reject_reason", "bench_id", "match_pos"),
      watermarkDelay)

  private def dedupByDigest(gated: DataFrame, watermarkDelay: String): DataFrame =
    if (gated.isStreaming)
      gated
        .withWatermark("ingest_ts", watermarkDelay)
        .dropDuplicatesWithinWatermark("digest")
    else
      gated.dropDuplicates("digest")

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

  /** [[writeCorpus]] with the audit trail a gate owes its operators (the
    * near-dup suppressor's pattern): gate rejects — the quality rules
    * and, when a `watchlist` is given, "contaminated" with first-hit
    * evidence — land in `<table>_rejects` instead of vanishing, while
    * passers flow through the watermark digest-dedup into the
    * source-partitioned landing table. ONE query AND ONE PLAN BRANCH
    * (the r10 two-branch decode lesson applied to the hashing probe —
    * branching kept/rejects off the gate projection would evaluate the
    * fenced probe UDF once per branch): rejects ride the SAME stateful
    * dedup as passers under a reject-unique key — "r:"-prefixed so it
    * can never collide with a content digest, keyed by (digest, doc_id)
    * so two distinct junk docs with identical text both audit while an
    * exact redelivery of the same reject dedups the way a landing
    * would. A reject therefore costs one watermark-bounded state entry
    * instead of a second full gate evaluation per document, and gate
    * failures share the dedup's lateness policy — a DELIBERATE trade
    * (the image/audio suppressors made the same one): a gate failure
    * arriving later than `watermarkDelay` is dropped by the dedup
    * operator UNAUDITED, so the rejects table is complete only within
    * the watermark horizon, like every other at-ingest guard here; the
    * full-history audit is the batch guard over the landed corpus
    * (ext126), which a late-dropped doc never entered. The digest
    * dedup's own
    * drops stay silent BY DESIGN — they are duplicates of rows that
    * landed (the full-history evidence job is the batch dedup family).
    * `docs` is a parsed ([[parse]]-schema) stream.
    */
  def writeAudited(
      docs: DataFrame, table: String, checkpoint: String,
      minTokens: Int = 5, minDistinctRatio: Double = 0.2,
      watermarkDelay: String = "10 minutes",
      watchlist: Option[graft.operators.ContaminationGuard.BenchIndex] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val routed = gateVerdicts(docs, minTokens, minDistinctRatio, watchlist)
      .withColumn("__dedup_key",
        when(col("reject_reason").isNull, concat(lit("k:"), col("digest")))
          .otherwise(concat_ws(":", lit("r"), col("digest"),
            col("doc_id").cast("string"))))
    routed
      .withWatermark("ingest_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("__dedup_key")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.cache()
        try {
          b.filter(col("reject_reason").isNull)
            .drop("__dedup_key", "reject_reason", "bench_id", "match_pos")
            .write.mode("append").partitionBy("source").parquet(table)
          b.filter(col("reject_reason").isNotNull)
            .drop("__dedup_key")
            .write.mode("append").parquet(s"${table}_rejects")
        } finally { b.unpersist(); () }
      }
      .start()
  }

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
