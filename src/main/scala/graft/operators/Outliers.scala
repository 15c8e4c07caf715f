package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier audit over a numeric column using Tukey
  * fences: a value is an outlier when it falls outside
  * [p25 − k·IQR, p75 + k·IQR] of ITS OWN group. On a training corpus
  * this is the length-filter dial: truncated fragments sit below the low
  * fence, concatenation bugs and boilerplate walls above the high one —
  * and per-source fences matter because a normal length for one source is
  * an outlier for another.
  *
  * Scale shape: one grouped aggregate computes the exact quartiles, the
  * nGroups-row fence table joins back via AQE broadcast, one more
  * aggregate counts. Exact `percentile` buffers each GROUP's values — the
  * same bound as Q31, acceptable because groups here are sources (few,
  * large) and the buffered column is one number per row; swap in
  * `approx_percentile` at extreme group cardinality.
  */
object Outliers {

  def tukeyFences(
      df: DataFrame, valueCol: String, groupCol: String,
      k: Double = 1.5): DataFrame = {
    val v = col(valueCol).cast("double")
    val fences = df.groupBy(col(groupCol))
      .agg(percentile(v, lit(0.25)).as("p25"),
        percentile(v, lit(0.75)).as("p75"))
      .select(col(groupCol),
        (col("p25") - (col("p75") - col("p25")) * k).as("lo"),
        (col("p75") + (col("p75") - col("p25")) * k).as("hi"))
    df.join(fences, groupCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(v < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(v > col("hi"), 1L).otherwise(0L)).as("n_high"),
        round(first(col("lo")), 6).as("lo_fence"),
        round(first(col("hi")), 6).as("hi_fence"))
  }
}
