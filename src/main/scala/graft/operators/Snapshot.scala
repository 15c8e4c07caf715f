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
}
