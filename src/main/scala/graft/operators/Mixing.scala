package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-based source mixing for training corpora: sample each source
  * so its share of the token budget is proportional to `avail^alpha`
  * (alpha < 1 flattens the distribution — the multilingual-training rule
  * that upsamples tail sources without letting a giant source dominate).
  *
  * Scale design: the mixing plan is one partial+final aggregate over the
  * corpus (per-source token totals — rows = |sources|, naturally bounded),
  * a 1-row totals aggregate, and a join of that small plan back to the
  * documents; AQE broadcasts the plan side when it fits, no forced hint.
  * Selection is the deterministic md5-order rule shared with
  * [[Sampling.stratifiedExact]]: per-row stable, engine-portable, re-run
  * safe.
  */
object Mixing {

  /** The mixing plan: for each source, `frac` = the fraction of its
    * documents to keep so that kept tokens ≈ budgetShare·total distributed
    * ∝ avail^alpha, capped at 1.0 and rounded to 6 dp (rounding BEFORE the
    * downstream ceil keeps every engine's boundary arithmetic identical).
    * Output: (sourceCol, avail, n_docs, frac).
    */
  def fractions(d: DataFrame, sourceCol: String, tokCol: String,
      alpha: Double, budgetShare: Double): DataFrame = {
    require(budgetShare > 0 && budgetShare <= 1,
      s"budgetShare must be in (0,1], got $budgetShare")
    val a = d.groupBy(sourceCol)
      .agg(sum(col(tokCol)).as("avail"), count(lit(1)).as("n_docs"))
    val t = a.agg(sum(pow(col("avail"), alpha)).as("sw"),
      sum(col("avail")).as("total"))
    a.crossJoin(t).select(
      col(sourceCol), col("avail"), col("n_docs"),
      round(least(lit(1.0),
        lit(budgetShare) * col("total") * pow(col("avail"), alpha) /
          col("sw") / col("avail")), 6).as("frac"))
  }

  /** Realize the plan: keep the first ceil(frac·n_docs) documents of each
    * source in md5(id) hash order, and report per source what the mix kept.
    * Input must carry (sourceCol, idCol, tokCol). Output:
    * (sourceCol, avail_tokens, n_docs, frac, kept_docs, kept_tokens).
    */
  def temperatureMix(d: DataFrame, sourceCol: String, idCol: String,
      tokCol: String, alpha: Double, budgetShare: Double): DataFrame = {
    val reserved = Seq("__rn", "avail", "n_docs", "frac")
    val clash = d.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with temperatureMix internals")
    val p = fractions(d, sourceCol, tokCol, alpha, budgetShare)
    val w = Window.partitionBy(sourceCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val kept = d.join(p, sourceCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= ceil(col("frac") * col("n_docs")))
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("kept_docs"), sum(col(tokCol)).as("kept_tokens"))
    // left join: a source whose frac rounds to 0 must still appear in the
    // report as kept_docs = 0, not vanish — the caller auditing the mix
    // can't otherwise tell "excluded by budget" from "absent from input"
    p.join(kept, Seq(sourceCol), "left")
      .select(col(sourceCol), col("avail").as("avail_tokens"),
        col("n_docs"), col("frac"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
  }
}
