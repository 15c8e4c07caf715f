package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.ImageDedup

/** Streaming IMAGE near-duplicate suppression — [[NearDupIngest]]'s shape
  * transplanted to the image modality: an arriving image is dropped when
  * its dHash sits within Hamming `maxDist` of ANY image seen inside the
  * watermark horizon, so a re-encoded or lightly-perturbed redelivery
  * (the case a byte digest cannot catch) stays out of the landing table.
  *
  * Batch/stream agreement: the fingerprint is [[ImageDedup.fingerprint]]
  * (mirror-canonical DCT pHash since r9) and the
  * bucket keys are [[ImageDedup.bandSlices]] — the EXACT arithmetic of the
  * batch pair join (ext101), so both sides agree on what "near-duplicate"
  * means and which band bucket a hash lands in (pigeonhole recall at the
  * threshold holds per bucket exactly as in batch). One stateful operator
  * keyed by (band, slice value); per-bucket state is watermark-evicted AND
  * capped (`maxPerBucket`, oldest-out — the documented recall trade).
  * An image's verdict rows all travel in its own micro-batch, so the
  * per-image any-band rollup is plain batch work in the sink, exactly the
  * [[NearDupIngest]] division of labor.
  */
object ImageIngest {

  /** One band row; the PNG payload rides ONCE (band 0) so the explode does
    * not multiply the blob. */
  final case class ImgBandRow(
      band: Int, key: Long, imgId: Long, source: String,
      ts: java.sql.Timestamp, phash: Long, png: Array[Byte])

  final case class ImgEntry(tsMillis: Long, imgId: Long, phash: Long)
  final case class ImgBucketState(entries: Seq[ImgEntry])

  /** Per-(image, band) verdict: the closest hash this band's bucket held —
    * `dist` 64 (sentinel, farther than any threshold) when the bucket was
    * empty; png non-null only on band 0. */
  final case class ImgBandVerdict(
      img_id: Long, source: String, ts_millis: Long, band: Int,
      dist: Long, matched_img: Long, png: Array[Byte])

  /** Explode (img_id, source, ingest_ts, png) into watermarked band rows.
    * Undecodable blobs are dropped map-side (they can duplicate nothing).
    */
  def bandRows(images: DataFrame, watermarkDelay: String,
      maxDist: Int = 3): Dataset[ImgBandRow] = {
    val spark = images.sparkSession
    import spark.implicits._
    images
      .withColumn("phash", ImageDedup.fingerprint(col("png")))
      .filter(col("phash").isNotNull)
      .withWatermark("ingest_ts", watermarkDelay)
      .select(col("img_id"), col("source"), col("ingest_ts"), col("phash"),
        explode(ImageDedup.bandSlices(col("phash"), maxDist)).as("s"),
        col("png"))
      .select(col("s.b").as("band"), col("s.v").as("key"),
        col("img_id").as("imgId"), col("source"),
        col("ingest_ts").as("ts"), col("phash"),
        when(col("s.b") === 0, col("png")).as("png"))
      .as[ImgBandRow]
  }

  /** The keyed state transition — rows in (ts, imgId) order so same-batch
    * duplicates resolve deterministically (earliest survives). */
  private[streaming] def processBucket(ttlMillis: Long, maxPerBucket: Int)(
      key: (Int, Long),
      rows: Iterator[ImgBandRow],
      state: GroupState[ImgBucketState]): Iterator[ImgBandVerdict] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val horizon = state.getCurrentWatermarkMs() - ttlMillis
      var entries = state.getOption.map(_.entries).getOrElse(Seq.empty)
        .filter(_.tsMillis >= horizon)
      val out = Seq.newBuilder[ImgBandVerdict]
      rows.toSeq.sortBy(r => (r.ts.getTime, r.imgId)).foreach { r =>
        val tsMillis = r.ts.getTime
        var best = 64L
        var bestImg = -1L
        entries.foreach { e =>
          // skip SELF-matches: a same-batch redelivery carrying the SAME
          // img id would otherwise collapse into one rollup group whose
          // min_dist=0 rejects BOTH copies — the earliest copy of an
          // identical-id redelivery must still land (r8 ADVICE)
          if (e.imgId != r.imgId) {
            val d = java.lang.Long.bitCount(r.phash ^ e.phash).toLong
            if (d < best) { best = d; bestImg = e.imgId }
          }
        }
        out += ImgBandVerdict(r.imgId, r.source, tsMillis, r.band,
          best, bestImg, r.png)
        entries = (entries :+ ImgEntry(tsMillis, r.imgId, r.phash))
          .sortBy(e => (e.tsMillis, e.imgId)).takeRight(maxPerBucket)
      }
      if (entries.isEmpty) state.remove()
      else {
        state.update(ImgBucketState(entries))
        state.setTimeoutTimestamp(math.max(
          entries.map(_.tsMillis).max + ttlMillis,
          state.getCurrentWatermarkMs() + 1))
      }
      out.result().iterator
    }
  }

  /** Band rows → per-(image, band) verdicts through the keyed state store. */
  def verdicts(rows: Dataset[ImgBandRow], ttlMillis: Long,
      maxPerBucket: Int = 256): Dataset[ImgBandVerdict] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState[ImgBucketState, ImgBandVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        processBucket(ttlMillis, maxPerBucket))(
        Encoders.product[ImgBucketState], Encoders.product[ImgBandVerdict])
  }

  /** Per-image rollup of one micro-batch's verdicts: keep iff the CLOSEST
    * match across all bands stays beyond `maxDist`. Output: (img_id,
    * source, ingest_ts, png, min_dist, matched_img, keep). */
  def rollup(batch: DataFrame, maxDist: Int): DataFrame =
    batch.groupBy(col("img_id"))
      .agg(
        first(col("source")).as("source"),
        timestamp_millis(first(col("ts_millis"))).as("ingest_ts"),
        first(col("png"), ignoreNulls = true).as("png"),
        min(col("dist")).as("min_dist"),
        // tie-break the evidence image deterministically
        min_by(col("matched_img"), struct(col("dist"), col("matched_img")))
          .as("matched_img"))
      .withColumn("keep", col("min_dist") > maxDist)

  /** End-to-end: (img_id, source, ingest_ts, png) stream → near-deduped
    * landing table (kept images, partitioned by source) + `<table>_rejects`
    * with match evidence — the audit trail the gate owes its operators. */
  def writeDeduped(
      images: DataFrame, table: String, checkpoint: String,
      maxDist: Int = 3, watermarkDelay: String = "10 minutes",
      maxPerBucket: Int = 256): org.apache.spark.sql.streaming.StreamingQuery = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(watermarkDelay))
    require(iv.months == 0, "watermarkDelay must not use month units")
    val ttlMillis = iv.days * 86400000L + iv.microseconds / 1000L
    verdicts(bandRows(images, watermarkDelay, maxDist), ttlMillis, maxPerBucket)
      .toDF()
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val r = rollup(batch, maxDist).cache()
        try {
          r.filter(col("keep")).drop("keep")
            .repartition(col("source"))
            .write.mode("append").partitionBy("source").parquet(table)
          r.filter(!col("keep")).drop("keep")
            .write.mode("append").parquet(s"${table}_rejects")
        } finally { r.unpersist(); () }
      }
      .start()
  }
}
