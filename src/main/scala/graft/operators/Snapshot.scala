package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the delivery-versioning audit between two
  * crawls/exports of the same collection: which documents were added,
  * removed, changed, or untouched. The scale contract mirrors
  * [[Dedup.incrementalExact]] (EXT47): each side contributes its id and a
  * 16-byte content digest computed map-side — the full text never crosses
  * the join, so the shuffle is O(rows × digest), and the join itself is a
  * plain equi full-outer on the id.
  */
object Snapshot {

  /** Per-id diff row: (id, group, status ∈ added|removed|changed|unchanged)
    * where `group` carries `groupCol` from whichever side has the row.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, contentCol: String, groupCol: String): DataFrame = {
    // presence comes from explicit per-side markers, NOT digest nullability:
    // a NULL-content row still EXISTS in its snapshot (md5(NULL) is NULL,
    // which would otherwise misreport it as added/removed), and two NULL
    // contents are equal — hence the null-safe digest compare below
    val o = oldDf.select(col(idCol).as("id"), lit(true).as("in_old"),
      md5(col(contentCol)).as("old_digest"), col(groupCol).as("old_g"))
    val n = newDf.select(col(idCol).as("id"), lit(true).as("in_new"),
      md5(col(contentCol)).as("new_digest"), col(groupCol).as("new_g"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("new_g"), col("old_g")).as("group"),
        when(col("in_old").isNull, lit("added"))
          .when(col("in_new").isNull, lit("removed"))
          .when(col("old_digest") <=> col("new_digest"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The audit table: counts per (group, status). */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, contentCol: String, groupCol: String): DataFrame =
    diff(oldDf, newDf, idCol, contentCol, groupCol)
      .groupBy(col("group").as(groupCol), col("status"))
      .agg(count(lit(1)).as("n"))

  /** Apply a versioned changelog to a base snapshot — the INVERSE of
    * [[diff]], i.e. MERGE-INTO / CDC-apply semantics: per id the
    * HIGHEST-version change wins; `op = 'upsert'` replaces (or inserts)
    * the row, `op = 'delete'` removes the id, ids without changes pass
    * through. At EQUAL version, delete beats upsert — erasure-biased on
    * conflicting deliveries (the GDPR-safe tie), and deterministic on both
    * engines (plain lexicographic op order). A delete of an absent id is a
    * no-op. Any other `op` value throws AT EXECUTION (inside the
    * projection, so column pruning cannot drop the guard).
    *
    * `changes` must carry (`idCol`, `versionCol`, `opCol`) plus every
    * non-id column of `base` (payload values for upserts; ignored for
    * deletes). Output has exactly `base`'s schema.
    *
    * Scale shape: latest-change selection is a per-id top-1 window
    * (WindowGroupLimit — partial per-partition top-k, never a full sort),
    * then ONE full-outer equi join on the id. The changelog is typically
    * ≪ base, and the base payload crosses the shuffle once.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame,
      idCol: String, versionCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == idCol)
    val missing = (payload :+ idCol).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"applyChangelog: changes is missing base columns: ${missing.mkString(", ")}")
    val opGuard = when(col(opCol).isin("upsert", "delete"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"applyChangelog: $opCol must be upsert|delete, got "),
        coalesce(col(opCol), lit("NULL")))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(versionCol).desc, col(opCol))
    val latest = changes
      .withColumn("__op", opGuard)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol) +:
        (payload.map(p => col(p).as(s"__c_$p")).toSeq :+ col("__op")): _*)
    base.select(col(idCol) +: payload.map(p => col(p).as(s"__b_$p")).toSeq: _*)
      .join(latest, Seq(idCol), "full_outer")
      .filter(col("__op").isNull || col("__op") === "upsert")
      .select(col(idCol) +: payload.map(p =>
        when(col("__op") === "upsert", col(s"__c_$p"))
          .otherwise(col(s"__b_$p")).as(p)).toSeq: _*)
  }
}
