package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine model evaluation: the per-class classification report
  * (support, predicted count, true positives, precision/recall/F1) every
  * data pipeline needs the moment it trains or applies a classifier
  * (EXT22's language ID, EXT63's quality gate). Three exact count
  * aggregates + two |classes|-row joins — no per-row state, so the report
  * costs three passes over (label, pred) pairs at any scale.
  *
  * Undefined ratios are NULL, not 0: a class never predicted has no
  * precision, a class absent from the truth has no recall (and ANSI-mode
  * division by zero would otherwise throw). F1 is NULL unless both
  * components exist and sum positive.
  */
object Evaluation {

  def classificationReport(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val base = df.select(col(labelCol).as("label"), col(predCol).as("pred"))
    val actual = base.groupBy(col("label").as("cls"))
      .agg(count(lit(1)).as("n_actual"))
    val predicted = base.groupBy(col("pred").as("cls"))
      .agg(count(lit(1)).as("n_pred"))
    val tp = base.filter(col("label") <=> col("pred")) // null-safe: (NULL,NULL) agrees
      .groupBy(col("label").as("cls")).agg(count(lit(1)).as("tp"))
    // null-safe (<=>) joins: a NULL class (abstaining classifier, missing
    // truth label) must merge into ONE report row, not split across sides
    val a = actual.withColumnRenamed("cls", "a_cls")
    val p = predicted.withColumnRenamed("cls", "p_cls")
    val t = tp.withColumnRenamed("cls", "t_cls")
    val joined = a.join(p, a("a_cls") <=> p("p_cls"), "full_outer")
      .withColumn("cls", coalesce(col("a_cls"), col("p_cls")))
      .join(t, col("cls") <=> t("t_cls"), "left")
      .select(col("cls"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
    val precision = when(col("n_pred") > 0,
      round(col("tp").cast("double") / col("n_pred"), 6))
    val recall = when(col("n_actual") > 0,
      round(col("tp").cast("double") / col("n_actual"), 6))
    joined
      .withColumn("precision", precision)
      .withColumn("recall", recall)
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
          (col("precision") + col("recall")) > 0,
          round(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")), 6)))
  }
}
