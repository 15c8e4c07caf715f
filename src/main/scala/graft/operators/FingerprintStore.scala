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
  * EAGERLY (checkpoint) before appending survivors, so the probe never
  * observes its own delivery's rows; one writer at a time (the daily
  * ingest job), readers any time — append-only parquet gives snapshot
  * reads per query. Re-running a completed delivery is NOT idempotent
  * (its survivors would re-append and then self-match); at production
  * scale the append lands behind a transactional table commit, exactly
  * as ext73's index overwrite is staged.
  */
object FingerprintStore {

  /** Initialize (or reset) the store from a hash frame (id, phash). */
  def init(hashes: DataFrame, dir: String): Unit =
    hashes.select(col("id"), col("phash"))
      .write.mode("overwrite").parquet(dir)

  /** The store as a frame (id, phash). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).select(col("id"), col("phash"))

  /** One delivery through the store: verdicts for every delivered id
    * ([[ImageDedup.incrementalVerdicts]] semantics — dedupe the delivery
    * within itself, then probe the persisted table), then APPEND the
    * surviving (kept) hashes so the next delivery sees them. Returns the
    * verdict frame (id, verdict, matched_id, dist), eagerly computed.
    */
  def ingest(spark: SparkSession, dir: String, deliveryHashes: DataFrame,
      maxDist: Int = 3): DataFrame = {
    val delivery = deliveryHashes.select(col("id"), col("phash"))
      .localCheckpoint(true)
    val verdicts = ImageDedup.incrementalVerdicts(
      delivery, read(spark, dir), maxDist)
      .localCheckpoint(true) // materialize BEFORE mutating the store
    delivery
      .join(verdicts.filter(col("verdict") === "kept").select("id"), Seq("id"))
      .write.mode("append").parquet(dir)
    verdicts
  }
}
