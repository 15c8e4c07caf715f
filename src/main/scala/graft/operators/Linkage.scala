package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter, JASA 1969) — the entity
  * resolution primitive a corpus pipeline uses to link records ACROSS two
  * sources when no shared key exists (the same page crawled twice, a doc
  * and its re-scrape, a profile in two feeds): candidate pairs from a
  * BLOCKING stage are scored by summing per-field log-likelihood weights
  * (agreement evidence m/u-ratio in log space) and classified
  * match / possible / non-match by two thresholds, with everything outside
  * the blocking declared non-match by construction.
  *
  * Division of labor, built for scale:
  *   - BLOCKING is the caller's choice and does the 100 TB heavy lifting —
  *     e.g. [[Dedup.charSetSimilarityJoin]] (lossless prefix-filter over
  *     char n-grams) or [[Dedup.minHashLsh]] band buckets. This operator
  *     never generates pairs, so it inherits the candidate bound of
  *     whatever join produced them; all-pairs never happens here.
  *   - FIELD COMPARISON + SCORING (this operator) is a per-row map over
  *     the candidate frame: zero shuffles added, codegen-friendly
  *     CASE-sum arithmetic, candidates carry ids and scalars only.
  *
  * Determinism contract (what makes a probabilistic linker
  * oracle-checkable): the weights are supplied as EXACT rational literals
  * in log space (pre-estimated; EM fitting of m/u is upstream and out of
  * scope), each field agreement is a boolean, and the score is the sum of
  * per-field constants in DECLARED FIELD ORDER (left-assoc), rounded to
  * 6 dp before thresholding — two engines walking the same field list add
  * the same doubles in the same order.
  */
object Linkage {

  /** One comparison field: `agree` is a boolean column over the candidate
    * frame; `wAgree`/`wDisagree` are the log-likelihood weights
    * (log2(m/u) and log2((1−m)/(1−u)) under Fellegi–Sunter, supplied
    * directly as literals).
    */
  final case class FieldSpec(name: String, agree: Column,
      wAgree: Double, wDisagree: Double)

  /** Score + classify `candidates` over `fields`. Adds one
    * `agree_<name>` boolean per field, `score` (6-dp double) and `cls`
    * (`match` / `possible` / `non_match`):
    * score ≥ `matchThreshold` → match, ≥ `possibleThreshold` → possible.
    */
  def fellegiSunter(candidates: DataFrame, fields: Seq[FieldSpec],
      matchThreshold: Double, possibleThreshold: Double): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field")
    require(matchThreshold > possibleThreshold,
      "matchThreshold must exceed possibleThreshold")
    val withAgree = fields.foldLeft(candidates) { (df, f) =>
      df.withColumn(s"agree_${f.name}", f.agree)
    }
    val score = fields
      .map(f => when(col(s"agree_${f.name}"), lit(f.wAgree))
        .otherwise(lit(f.wDisagree)))
      .reduceLeft(_ + _)
    withAgree
      .withColumn("score", round(score + lit(0.0), 6))
      .withColumn("cls",
        when(col("score") >= matchThreshold, lit("match"))
          .when(col("score") >= possibleThreshold, lit("possible"))
          .otherwise(lit("non_match")))
  }
}
