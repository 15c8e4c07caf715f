package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search (k-NN) over an embedding column.
  *
  * Two tiers:
  *   - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *     the full corpus; one pass, no corpus shuffle. Right answer whenever
  *     |queries| is broadcast-able, at any corpus size.
  *   - [[lshTopK]]: approximate — random-hyperplane LSH buckets corpus and
  *     queries; only same-bucket candidates are scored (multi-probe via
  *     fewer bits = bigger recall). The bucket join is an equi join, so work
  *     scales with bucket occupancy, not |corpus|·|queries|.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * Inputs must have (idCol, vecCol: array<float|double>).
    * Output: (query_id, neighbor_id, sim, rank) with rank 1..k, ties broken
    * by neighbor id (deterministic).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm2(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm2(col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosinePrenormed(dot(col("qv"), col("cv")), col("qn"), col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Approximate top-k via hyperplane LSH bucketing: candidates = corpus
    * vectors sharing the query's `nBits`-bit bucket; exact cosine + top-k
    * within candidates. Recall/cost dial: fewer bits → bigger buckets.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nBits: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", hyperplaneBucket(col("qv"), nBits))
      .withColumn("qn", norm2(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", hyperplaneBucket(col("cv"), nBits))
      .withColumn("cn", norm2(col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosinePrenormed(dot(col("qv"), col("cv")), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }
}
