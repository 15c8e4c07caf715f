package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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
