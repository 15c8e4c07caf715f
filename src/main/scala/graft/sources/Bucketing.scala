package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table layout for shuffle-free co-located joins (SURVEY.md §4 /
  * the 100 TB playbook): writing both sides of a recurring join bucketed
  * (and sorted) by the join key lets Spark plan a SortMergeJoin with NO
  * Exchange on either side — at fact-table scale that deletes the single
  * most expensive stage of the pipeline. The analog of the reference's
  * Cassandra partition-key design ((camera_id, day),
  * CassandraService.java:139-140): physical layout chosen once, point
  * queries and joins ride it forever.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed parquet table. */
  def writeBucketed(
      df: DataFrame, tableName: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Join two same-bucketed tables on the bucket column. With equal bucket
    * counts the join is Exchange-free (verified by BucketingSpec).
    */
  def colocatedJoin(
      spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
