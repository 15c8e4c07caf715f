package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity.PqModel

/** Persisted IVF-PQ index lifecycle — the production contract
  * [[Similarity.ivfPqTopK]]'s one-shot form doesn't give you: build the
  * index ONCE (train + encode + write), answer queries MANY times without
  * retraining or re-encoding the corpus.
  *
  * On-disk layout under `dir`:
  *   - `codes/` — the (neighbor_id, cn, list, codes) rows, PARTITIONED BY
  *     list: the inverted-file structure materialized as directory layout,
  *     so a probe of p lists is eligible to read p/nLists of the index
  *     (partition pruning / DPP on the list join), the disk analog of
  *     "only probed lists are scanned".
  *   - `model/` — the trained quantizer as ONE parquet row (dim, m, ksub,
  *     coarse, codebooks): parquet instead of a sidecar format so reload
  *     needs no parser and the schema is self-describing.
  *
  * Determinism: training is seeded and driver-side, so build → search
  * equals the one-shot [[Similarity.ivfPqTopK]] bit-for-bit under the same
  * parameters (spec-pinned in VectorIndexSpec).
  */
object VectorIndex {

  def buildIvfPq(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nLists: Int = 16, m: Int = 8, ksub: Int = 16,
      sampleSize: Int = 2048, seed: Long = 42L): Unit = {
    val spark = corpus.sparkSession
    val model = Similarity.trainPq(
      Similarity.sampleVectors(corpus, idCol, vecCol, sampleSize, seed), nLists, m, ksub)
    Similarity.encodePqIndex(corpus, idCol, vecCol, model)
      .write.mode("overwrite").partitionBy("list").parquet(s"$dir/codes")
    spark.createDataFrame(Seq((
        model.dim, model.m, model.ksub,
        model.coarse.map(_.toSeq).toSeq,
        model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)))
      .toDF("dim", "m", "ksub", "coarse", "codebooks")
      .write.mode("overwrite").parquet(s"$dir/model")
    // build-time distribution reference for retrainIfDrifted, one tiny
    // parquet with TWO dials (r11 verdict #3): ext90's sign-octant
    // buckets of the BUILD corpus (quantizer-free, ≤ 8 rows), plus the
    // coarse-LIST occupancy under the just-trained quantizer (≤ nLists
    // rows) — read back from the codes just written, so the reference is
    // exactly what the index holds, with no second assignment pass.
    // Octants are blind to sign-preserving drift (uniform scale, rotation
    // beyond dims 1–3); list occupancy is not — and vice versa for drift
    // that moves signs without crossing list boundaries. Either firing
    // triggers the rebuild.
    octantCounts(corpus, vecCol).withColumn("dial", lit(DialOctant))
      .unionByName(
        spark.read.parquet(s"$dir/codes")
          .groupBy(col("list").cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"))
          .withColumn("dial", lit(DialList)))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  private val DialOctant = "octant"
  private val DialList = "list"

  /** ext90's sign-octant bucket over the first three dims of `vecCol` —
    * the deterministic, quantizer-free drift key shared by
    * [[octantCounts]] (build-time reference) and the one-pass
    * [[graft.operators.Similarity.driftHistograms]] (trigger-time
    * current), so the two sides can never drift apart. */
  private def octantBucket(vecCol: String) =
    (when(element_at(col(vecCol), 1) > 0, 4).otherwise(0) +
      when(element_at(col(vecCol), 2) > 0, 2).otherwise(0) +
      when(element_at(col(vecCol), 3) > 0, 1).otherwise(0))
      .cast("long")

  /** Sign-octant histogram over the first three dims — ext90's
    * deterministic, quantizer-free drift buckets (≤ 8 rows whatever the
    * corpus size): the distribution fingerprint [[buildIvfPq]] stores
    * and [[retrainIfDrifted]] compares against. */
  private def octantCounts(corpus: DataFrame, vecCol: String): DataFrame =
    corpus.filter(col(vecCol).isNotNull)
      .select(octantBucket(vecCol).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** ext90's PSI arithmetic (Laplace +1 over the union of buckets),
    * driver-side over the two ≤8-entry histograms. */
  private def psiOf(ref: Map[Long, Long], cur: Map[Long, Long]): Double = {
    val buckets = (ref.keySet ++ cur.keySet).toSeq.sorted
    val n = buckets.size
    val tRef = ref.values.sum
    val tCur = cur.values.sum
    buckets.map { b =>
      val p = (ref.getOrElse(b, 0L) + 1).toDouble / (tRef + n)
      val q = (cur.getOrElse(b, 0L) + 1).toDouble / (tCur + n)
      (p - q) * math.log(p / q)
    }.sum
  }

  /** The retrain trigger wired to the drift dials (r10 verdict #4):
    * ext88 measures that recall DECAYS after the corpus mutates under a
    * stale quantizer; ext75/ext90 measure the drift that predicts it;
    * this closes the loop. TWO dials, each a bounded histogram compared
    * with ext90's exact PSI arithmetic against its stored build-time
    * reference (`stats/`), retrain when EITHER crosses `threshold`
    * (returned psi = the max):
    *
    *  - sign-OCTANT buckets over dims 1–3 (quantizer-free; sees mean
    *    shifts that flip signs);
    *  - coarse-LIST occupancy — the current corpus assigned to the
    *    STORED centroids (r11 verdict #3; one map-side pass, ≤ nLists
    *    rows) — which sees the sign-PRESERVING drift octants cannot
    *    (uniform scale-up, rotation in higher dims): assignments move
    *    off the stale centroids exactly when the partition the index
    *    relies on stops matching the data, which is the recall-decay
    *    mechanism ext88 measures.
    *
    * When a dial fires, the quantizer is rebuilt
    * from the current corpus into a dot-prefixed staging dir (invisible
    * to readers of `codes/`) and published by directory renames —
    * codes, model and stats swap together, so a search never pairs new
    * codes with an old model. Below threshold NOTHING is touched
    * (spec-pinned byte-identical). Returns (psi, retrained).
    *
    * Failure contract matches [[deleteIvfPq]]: re-runnable, not atomic —
    * but never generation-mixing. A `.swap_pending` marker is created
    * only once staging is FULLY built and removed only after the last
    * rename, so the next call sees the marker and completes the swap AS
    * A UNIT before the stats read: every still-staged subdir is
    * published (already-published ones have no staged copy left and are
    * skipped). Healing per-subdir on "target missing" alone would be
    * wrong twice over — a crash mid-heal could strand NEW codes under
    * the OLD model and then report healthy, and the stats read could
    * wedge on a missing dir. The trigger can neither wedge itself nor
    * serve a mixed generation. Swap in the writer's exclusive window. */
  def retrainIfDrifted(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      nLists: Int = 16, m: Int = 8, ksub: Int = 16,
      sampleSize: Int = 2048, seed: Long = 42L): (Double, Boolean) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val staging = s"$dir/.retrain_staging"
    val marker = new org.apache.hadoop.fs.Path(s"$dir/.swap_pending")
    val subs = Seq("codes", "model", "stats")
    if (fs.exists(marker)) {
      subs.foreach { sub =>
        val staged = new org.apache.hadoop.fs.Path(s"$staging/$sub")
        if (fs.exists(staged))
          graft.util.AtomicPublish.replaceDir(fs, staged,
            new org.apache.hadoop.fs.Path(s"$dir/$sub"))
      }
      fs.delete(new org.apache.hadoop.fs.Path(staging), true): Unit
      fs.delete(marker, false): Unit
    }
    val statsDf = spark.read.parquet(s"$dir/stats")
    def toHist(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n")).toMap
    // a pre-two-dial stats file (no `dial` column) is all-octant — the
    // legacy dial keeps working; the list dial arms on the next rebuild
    val refByDial: Map[String, Map[Long, Long]] =
      if (statsDf.columns.contains("dial"))
        statsDf.collect().groupBy(_.getAs[String]("dial"))
          .view.mapValues(toHist).toMap
      else Map(DialOctant -> toHist(statsDf.collect()))
    // ONE corpus pass feeds BOTH dials (pre-r14: an octant job, then a
    // coarseOccupancy job — the full corpus scanned twice per trigger
    // probe; the scan is the trigger's dominant cost at corpus scale).
    // The collect is bounded: ≤ 8 octant + ≤ nLists list rows.
    val curByDial: Map[String, Map[Long, Long]] =
      Similarity.driftHistograms(corpus, vecCol,
          octantBucket(vecCol), DialOctant,
          if (refByDial.contains(DialList)) Some(loadModel(spark, dir))
          else None, DialList)
        .collect().groupBy(_.getAs[String]("dial"))
        .view.mapValues(toHist).toMap
    val psiOct = psiOf(refByDial(DialOctant),
      curByDial.getOrElse(DialOctant, Map.empty))
    val psiList = refByDial.get(DialList).map(refList =>
      psiOf(refList, curByDial.getOrElse(DialList, Map.empty)))
    val psi = math.max(psiOct, psiList.getOrElse(0.0))
    if (psi <= threshold) (psi, false)
    else {
      fs.delete(new org.apache.hadoop.fs.Path(staging), true): Unit
      buildIvfPq(corpus, idCol, vecCol, staging, nLists, m, ksub,
        sampleSize, seed)
      fs.create(marker, true).close() // staging complete — arm the heal
      subs.foreach { sub =>
        graft.util.AtomicPublish.replaceDir(fs,
          new org.apache.hadoop.fs.Path(s"$staging/$sub"),
          new org.apache.hadoop.fs.Path(s"$dir/$sub"))
      }
      fs.delete(new org.apache.hadoop.fs.Path(staging), true): Unit
      fs.delete(marker, false): Unit
      (psi, true)
    }
  }

  def loadModel(spark: SparkSession, dir: String): PqModel = {
    val r = spark.read.parquet(s"$dir/model").head()
    // row arrays come back as mutable.ArraySeq — type against collection.Seq
    PqModel(
      r.getAs[Int]("dim"), r.getAs[Int]("m"), r.getAs[Int]("ksub"),
      r.getAs[collection.Seq[collection.Seq[Double]]]("coarse")
        .map(_.toArray).toArray,
      r.getAs[collection.Seq[collection.Seq[collection.Seq[Double]]]]("codebooks")
        .map(_.map(_.toArray).toArray).toArray)
  }

  /** Incremental index maintenance: encode a NEW delivery under the
    * EXISTING quantizer and append its codes — no retraining, no re-encode
    * of the old corpus (the standard IVF-PQ maintenance contract; the
    * quantizer drifts from the true distribution as data shifts, which is
    * what [[Similarity.classCentroids]]-based drift monitoring is for —
    * rebuild when drift crosses your threshold). Append-mode parquet into
    * the same list= partitions.
    */
  def appendIvfPq(newBatch: DataFrame, idCol: String, vecCol: String,
      dir: String): Unit = {
    val model = loadModel(newBatch.sparkSession, dir)
    Similarity.encodePqIndex(newBatch, idCol, vecCol, model)
      .write.mode("append").partitionBy("list").parquet(s"$dir/codes")
  }

  /** Index deletion — the remaining CRUD leg (GDPR erasure, retracted
    * documents, dedup-driven pruning): drop `ids` from the codes WITHOUT
    * touching unaffected inverted lists. The codes of the victim ids live
    * in a handful of list= partitions; dynamic partition overwrite
    * rewrites ONLY those partitions (anti-joined against the tombstones),
    * so a delete of d docs costs O(lists containing them), never a full
    * index rewrite — at index scale the difference between an erasure
    * request and a rebuild. The model is untouched (a quantizer does not
    * unlearn; retrain on drift, per [[appendIvfPq]]'s contract).
    *
    * Failure contract: the operation is IDEMPOTENTLY RE-RUNNABLE, not
    * atomic (plain parquet directories have no multi-partition commit). A
    * crash at any point leaves the index either untouched or partially
    * erased, and re-running with the same `ids` completes the deletion:
    * `affected` is recomputed from whatever codes remain, so already-
    * cleared lists drop out and still-stale lists are rewritten. Callers
    * MUST retry a failed delete; fully-tombstoned list dirs are cleared
    * before the overwrite so the pure-deleted-data files go first, and the
    * staging dir (survivor copies only) is removed on every exit path.
    */
  def deleteIvfPq(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val tombstones = broadcast(ids.select(col(idCol).as("neighbor_id")).distinct())
    val codes = spark.read.parquet(s"$dir/codes")
    // bounded collect: list ids number ≤ nLists by construction
    val affected = codes.join(tombstones, "neighbor_id")
      .select("list").distinct().collect().map(_.getInt(0))
    if (affected.isEmpty) return
    // stage the survivors of the affected lists OUTSIDE the index first —
    // Spark refuses to overwrite a path it is reading, and a mid-rewrite
    // failure must not leave codes/ half-deleted
    val tmp = s"$dir/codes_rewrite_tmp"
    codes
      .filter(col("list").isin(affected.map(Integer.valueOf).toSeq: _*))
      .join(tombstones, Seq("neighbor_id"), "left_anti")
      .select(codes.columns.filter(_ != "list").map(col) :+ col("list"): _*)
      .write.mode("overwrite").partitionBy("list").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    try {
      val staged = spark.read.parquet(tmp)
      // dynamic overwrite only replaces partitions PRESENT in the write — a
      // list whose every row was tombstoned writes nothing and would keep
      // its stale files. Clear those partition dirs BEFORE the overwrite
      // (r6 advice): they hold ONLY deleted ids' codes, so for the erasure
      // use case they are the most urgent bytes to destroy, and a crash
      // between the two steps must not leave them readable behind a
      // "delete succeeded" overwrite.
      val remaining = staged.select("list").distinct().collect().map(_.getInt(0)).toSet
      affected.filterNot(remaining).foreach { l =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/codes/list=$l"), true): Unit
      }
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try staged.write.mode("overwrite").partitionBy("list").parquet(s"$dir/codes")
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    } finally
      // tmp holds only survivor copies (no deleted codes) — clean it on
      // every path so a failed run can't accumulate stale rewrite dirs
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true): Unit
  }

  /** Search a built index. `corpus` supplies raw vectors for the exact
    * refine stage only (the standard split: the index holds codes, the
    * store holds vectors).
    */
  def searchIvfPq(spark: SparkSession, dir: String,
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 2, refineFactor: Int = 4): DataFrame = {
    val model = loadModel(spark, dir)
    val index = spark.read.parquet(s"$dir/codes")
    Similarity.searchPqIndex(index, corpus, queries, idCol, vecCol,
      model, k, nProbe, refineFactor)
  }
}
