package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{ExtensionQueries, QueryDef, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared query inventory lives in [[graft.queries.RelationalQueries]]
  * (q01–q59 + q13b/q31b relational/TPC-H/event-analytics shapes, incl. the
  * recursive-CTE calendar fill and the Spark-4 SQL surfaces) and
  * [[graft.queries.ExtensionQueries]]
  * (ext01–ext112 + ext40b dedup / similarity / text / TF-IDF / ANN-recall /
  * packing / mixing / indexing / chunking / quantization / heavy-hitter /
  * contamination / PCA / LM-score / BPE-tokenizer / IVF-PQ / MMR /
  * classifier-training / layout / versioning / FIM / reweighting / privacy /
  * graph-centrality / monitoring / curation-funnel / span-removal extensions
  * plus the multimodal perceptual-dedup family ext101–ext105, its OR-gate
  * retention dual ext107 and the incremental fingerprint-table probe
  * ext108: image, audio, video, cross-modal gates, retention accounting,
  * delivery-vs-index dedup — plus audio clip containment ext109,
  * video shot segmentation ext110, the batch motion backfill ext111,
  * per-shot keyframe extraction ext112, the multimodal quality gates
  * ext113–ext115 (image / audio / per-video stats + verdicts) and the
  * perceptual eval-decontamination guard ext116 — plus video clip
  * containment ext117 (the ext109 symmetry closed), the per-source
  * image curation funnel ext118, VAD-shaped audio silence
  * segmentation ext119, the band-bucket health audit ext120, the
  * persisted fingerprint-store lifecycle ext121 (replay-safe
  * delivery_id-partitioned ingest since r10), the two-tier video
  * prefilter recall audit ext122 (whole-video + segment signature
  * tiers), span removal on the content-sampled production detector
  * ext123, the signature-tier band health audit ext124, the streaming
  * watchlist monitor at corpus scale ext125, the broadcast-probe
  * benchmark-contamination audit ext126 (exact) / guard ext127
  * (winnowing production tier), the benchmark-span excision
  * ext128 (detect → refine → remove closed, rebuilt-text md5
  * oracle-checked), the decontamination policy retention delta
  * ext129 (drop-doc vs excise-span priced from one probe pass), the
  * bloom → exact contamination funnel ext130 (megabyte membership
  * broadcast, flagged superset graduated to exact attribution) and
  * the retroactive watchlist sweep ext131 (watermarked delta sweep of
  * the landed corpus — ext125's other enforcement direction), the
  * bloom ingest → graduation funnel ext132 (the streaming deployed
  * shape of ext130: gate at the door, graduate suspects, re-admit
  * cleared false positives) and the fingerprint-store compaction
  * lifecycle ext133 (versioned base folds behind the manifest-v2/ack
  * protocol: protected in-flight delivery, replay after compaction,
  * generation retention and reclaim) and the streaming write-back
  * compaction arc ext134 (the perceptual ingest folding its own
  * epoch-keyed write-back partitions on micro-batch cadence from inside
  * foreachBatch's exclusive-writer window — retention and reclaim
  * observed live vs disk) and the ANN retrain-trigger arc ext135 (the
  * two-dial drift probe firing, swapping a staged rebuild and
  * self-disarming, per dial) and the landed-table small-file
  * compaction arc ext136 (journal-protected FFD bin-packing of the
  * plain-parquet landing table — heal-forward crash contract, files
  * at target byte-identical, file-sink tables refused) and the
  * rejects retention + marker compaction arc ext137 (the staged
  * rewrite behind a pending marker expiring aged audit rows, composed
  * with the graduation-marker compaction it has always been the
  * contractual upstream of) and the backlog-sharded compaction arc
  * ext138 (an over-budget file backlog recursing per partition subtree
  * — independent scoped runs, driver metadata bounded by one subtree's
  * share, idempotent no-op re-run) — 200 catalog entries total);
  * this object just flattens the catalog into the driver's Map shape.
  */
object SparkEntry {

  val all: Seq[QueryDef] = RelationalQueries.defs ++ ExtensionQueries.defs

  /** Flagship: the end-to-end video pipeline (producer → wire JSON → parse →
    * keyed stateful motion detect → storage layout) summarized per camera,
    * joined with the star-join query on sf0.001 as a literal smoke of both
    * halves of the engine. Driver checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.streaming.{FrameProducer, MotionPipeline}
    val img = java.nio.file.Files.createTempDirectory("entry-img").toString
    val frames = FrameProducer.framesBatch(spark, nCameras = 2, framesPerCamera = 3,
      t0Millis = 1700000000000L)
    val wire = FrameProducer.toWire(frames, nCameras = 2).select("value")
    val perCamera = MotionPipeline.toStorageLayout(
      MotionPipeline.detectBin(MotionPipeline.decodeWire(wire), img))
      .groupBy("camera_id")
      .agg(count(lit(1)).as("n_frames"))
    val star = all.find(_.name == "q05_star_join").get
      .build(spark, "/root/testdata/sf0.001")
      .agg(count(lit(1)).as("n_brands"))
    perCamera.crossJoin(star)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash-sketch operators whose output
    * is engine-specific by construction (rows-only check).
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
