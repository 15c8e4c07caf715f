package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join via the union + ordered-window formulation.
  *
  * Instead of the naive `queries JOIN refs ON key AND ref.ts <= q.ts` +
  * row_number (which explodes to O(|q|·|refs per key|) intermediate rows),
  * we union both inputs, sort once per key, and carry the latest reference
  * timestamp forward with a running MAX over a `ROWS ... 1 PRECEDING` frame.
  * Cost: ONE shuffle on the key + an in-partition sort — linear in input, the
  * shape that survives 100 TB. (Batch analog of the reference's per-camera
  * prev-frame ValueState, /root/reference/dvaf/processor/.../VideoProcessor.java:155-205.)
  */
object AsOf {

  /** For each event of `queryType`, the µs timestamp of the last event of
    * `refType` for the same user at-or-before it (ties: the reference sorts
    * first). Input must have columns user_id, event_id, ts_us, event_type.
    * Output: (event_id, user_id, ref_ts_us).
    */
  def lastEventBefore(events: DataFrame, refType: String, queryType: String): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin(refType, queryType))
      .withColumn("is_ref", when(col("event_type") === refType, 1).otherwise(0))
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts_us"), col("is_ref").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("ref_ts_us", max(when(col("is_ref") === 1, col("ts_us"))).over(w))
      .filter(col("event_type") === queryType)
      .select("event_id", "user_id", "ref_ts_us")
  }

  /** General two-table as-of: for each row of `left` (ALL its columns
    * preserved), attach `valueCol` from the latest `right` row with
    * `right.timeCol <= left.timeCol`, per `key`. Same union+window shape as
    * above. The latest right ROW wins even when its value is null (wrapped
    * in a struct so `last(…, ignoreNulls)` tracks row recency, not value
    * non-nullness — pandas merge_asof semantics). Right rows tied on
    * (key, timeCol) are broken by the value itself (greatest wins) so the
    * result is deterministic; callers needing a different tie policy should
    * pre-aggregate the right side to unique (key, time).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, timeCol: String, valueCol: String): DataFrame = {
    require(!left.columns.contains(valueCol),
      s"left already has a column named $valueCol")
    val l = left.withColumn("__side", lit(0))
    val r = right.select(col(key), col(timeCol), col(valueCol))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(key)
      .orderBy(col(timeCol), col("__side").desc, col(valueCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__ref",
        last(when(col("__side") === 1, struct(col(valueCol))), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .withColumn(valueCol, col("__ref").getField(valueCol))
      .drop("__side", "__ref")
  }
}
