package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential per-key monitoring statistics — recurrences a window function
  * CANNOT express (each row's value depends on the previous ROW'S RESULT,
  * not on a frame aggregate), done with the scale pattern for unbounded
  * groups: `repartition(key)` + `sortWithinPartitions(key, order)` + one
  * streaming fold over each partition's iterator (secondary sort). Unlike
  * `groupByKey.mapGroups`, no group is ever materialized — a key with a
  * billion rows costs the same per-row work as a key with ten, which is
  * the difference between a monitoring job and an OOM at corpus scale.
  */
object Monitoring {

  /** One-sided CUSUM changepoint statistic (Page 1954) per key, in
    * (orderCol, tieCol) order: S_0 = max(0, x_1 − drift),
    * S_t = max(0, S_{t−1} + x_t − drift), alarm when S_t > threshold.
    * All arithmetic is EXACT decimal (inputs rounded to 6 dp first), so
    * the whole recurrence is engine-portable — no float accumulation
    * anywhere. Output: one row per input row with the running statistic
    * and the alarm flag; the sustained-burst detector the q50 z-score
    * (point anomalies) cannot replace.
    */
  def cusum(df: DataFrame, keyCol: String, orderCol: String, tieCol: String,
      valueCol: String, drift: String, threshold: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val driftD = BigDecimal(drift)
    val thresholdD = BigDecimal(threshold)
    val zero = BigDecimal(0)
    val prepared = df.select(
        col(keyCol).cast("string").as("key"),
        col(orderCol).cast("long").as("ord"),
        col(tieCol).cast("long").as("tie"),
        round(col(valueCol), 6).cast("decimal(18,6)").as("x"))
      .filter(col("x").isNotNull)
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ord"), col("tie"))
      .toDF("_1", "_2", "_3", "_4")
      .as[(String, Long, Long, BigDecimal)]
    // narrow fold: deserialization and mapPartitions preserve the
    // within-partition (key, ord, tie) order established above
    prepared.mapPartitions { rows =>
      var curKey: String = null
      var s = zero
      rows.map { case (key, ord, tie, x) =>
        if (key != curKey) { curKey = key; s = zero } // new key: fresh statistic
        s = (s + x - driftD).max(zero)
        (key, ord, tie, x, s, s > thresholdD)
      }
    }
    .toDF("key", "ord", "tie", "x", "cusum", "alarm")
    // tuple BigDecimal encodes as (38,18); pin the declared scales exactly
    .select(col("key"), col("ord"), col("tie"),
      col("x").cast("decimal(18,6)").as("x"),
      col("cusum").cast("decimal(28,6)").as("cusum"), col("alarm"))
  }
}
