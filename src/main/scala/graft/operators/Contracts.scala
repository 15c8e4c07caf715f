package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-contract auditing ("unit tests for data", Schelter et al., VLDB
  * 2018 — the Deequ design): a declarative rule set over a table compiles
  * into as few passes as the rule classes allow, and the audit emits one
  * row per rule with the violation count — the gate a production pipeline
  * runs between ingest and publish.
  *
  * Scale shape (the part worth copying from the paper): every ROW-LOCAL
  * rule — not-null, range, regex, uniqueness-by-count-distinct — folds
  * into ONE aggregation over ONE scan of the table, no matter how many
  * rules there are; only referential rules (subset-of) pay their own
  * anti-join. Nothing is collected; the audit result is itself a frame.
  *
  * Semantics: NULLs violate only `notNull` — `inRange`/`matches` skip
  * them (completeness and validity are separate dials, per the paper);
  * `unique` counts the surplus rows beyond the distinct value count.
  */
object Contracts {

  sealed trait Rule { def name: String }

  /** Column (or expression) must never be NULL. */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
  }

  /** Non-null values of `column` (any SQL expression) must lie in
    * [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Rule {
    val name = s"in_range($column)"
  }

  /** Non-null values must match `regex` (Spark RLIKE / partial match —
    * anchor explicitly for full-match semantics). */
  final case class Matches(column: String, regex: String) extends Rule {
    val name = s"matches($column)"
  }

  /** `expr` must be unique across rows; violations = rows beyond one per
    * distinct value. */
  final case class Unique(column: String) extends Rule {
    val name = s"unique($column)"
  }

  /** Every non-null value of `column` must exist in `refColumn` of `ref`
    * (referential integrity). Pays one left-anti join. */
  final case class SubsetOf(column: String, ref: DataFrame,
      refColumn: String) extends Rule {
    val name = s"subset_of($column)"
  }

  /** Audit `df` (labelled `table`) against `rules`. Returns one row per
    * rule: (tbl, rule, total, violations, passed), in rule order.
    */
  def audit(df: DataFrame, table: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val rowLocal = rules.filter(!_.isInstanceOf[SubsetOf])
    val referential = rules.collect { case r: SubsetOf => r }

    val localFrame: Option[DataFrame] =
      if (rowLocal.isEmpty) None else Some(rowLocalAudit(df, rowLocal))

    // ONE total-count scan shared by every referential rule (lazily
    // checkpointed so each union branch reads the materialized 1-row
    // frame instead of re-running the count aggregate per rule).
    lazy val totalDf =
      df.agg(count(lit(1)).as("total")).localCheckpoint(false)
    val refFrames = referential.map { r =>
      val viol = df.select(expr(r.column).as("k")).filter(col("k").isNotNull)
        .join(r.ref.select(col(r.refColumn).as("k")), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("violations"))
      totalDf.crossJoin(viol)
        .select(lit(r.name).as("rule"), col("total"), col("violations"))
    }

    (localFrame.toSeq ++ refFrames)
      .reduceLeft(_ unionAll _)
      .select(lit(table).as("tbl"), col("rule"),
        col("total").cast("long").as("total"),
        col("violations").cast("long").as("violations"))
      .withColumn("passed", col("violations") === 0L)
  }

  /** Streaming contract audit: the SAME single-aggregation compilation
    * over a streaming frame — write with `outputMode("complete")` and each
    * trigger emits the cumulative (rule, total, violations, passed) rows,
    * the live ingest-gate dashboard. Row-local rules only: a referential
    * rule would need a stream-static anti join plus a second streaming
    * aggregate, and `Unique` a distinct aggregate — neither composes in
    * Structured Streaming; run [[audit]] on the landed batch for those.
    */
  def auditStream(df: DataFrame, table: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(!rules.exists(r =>
      r.isInstanceOf[SubsetOf] || r.isInstanceOf[Unique]),
      "referential/unique rules are not streamable — audit the landed batch")
    rowLocalAudit(df, rules)
      .select(lit(table).as("tbl"), col("rule"),
        col("total").cast("long").as("total"),
        col("violations").cast("long").as("violations"))
      .withColumn("passed", col("violations") === 0L)
  }

  /** Windowed streaming audit — per-event-time-window verdicts instead of
    * [[auditStream]]'s cumulative complete-mode rows: the shape an ingest
    * dashboard wants ("did the 14:05 window pass?"). Same single-aggregation
    * rule compilation, grouped by a tumbling window over `timeCol` with a
    * watermark of `delay`, so state is bounded and windows finalize. Write
    * with `outputMode("update")` for live per-trigger revisions of open
    * windows, or `"append"` for exactly-one final verdict per closed window.
    * Emits (tbl, window_start, window_end, rule, total, violations, passed).
    * Row-local rules only, as in [[auditStream]].
    */
  def auditStreamWindowed(df: DataFrame, table: String, rules: Seq[Rule],
      timeCol: String, windowDuration: String, delay: String): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(!rules.exists(r =>
      r.isInstanceOf[SubsetOf] || r.isInstanceOf[Unique]),
      "referential/unique rules are not streamable — audit the landed batch")
    val one = df.withWatermark(timeCol, delay)
      .groupBy(window(col(timeCol), windowDuration))
      .agg(count(lit(1)).as("total"), ruleAggs(rules): _*)
    one.select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("total"), explode(rulePairs(rules)).as("p"))
      .select(lit(table).as("tbl"),
        col("window_start"), col("window_end"), col("p.rule"),
        col("total").cast("long").as("total"),
        col("p.violations").cast("long").as("violations"))
      .withColumn("passed", col("violations") === 0L)
  }

  /** All row-local rules folded into ONE aggregation over ONE scan:
    * (rule, total, violations), one row per rule in declaration order. */
  private def rowLocalAudit(df: DataFrame, rowLocal: Seq[Rule]): DataFrame = {
    val one = df.agg(count(lit(1)).as("total"), ruleAggs(rowLocal): _*)
    one.select(col("total"), explode(rulePairs(rowLocal)).as("p"))
      .select(col("p.rule"), col("total"), col("p.violations"))
  }

  /** The per-rule violation aggregates. Sum-based counters are coalesced to
    * 0: over zero rows SUM is NULL, which would otherwise surface as a NULL
    * `violations` / NULL `passed` on an empty table or an empty first
    * streaming window — an empty input trivially passes every rule. */
  private def ruleAggs(
      rowLocal: Seq[Rule]): Seq[org.apache.spark.sql.Column] =
    rowLocal.zipWithIndex.map {
      case (NotNull(c), i) =>
        coalesce(sum(when(expr(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"v$i")
      case (InRange(c, lo, hi), i) =>
        coalesce(sum(when(expr(c).isNotNull &&
          (expr(c) < lit(lo) || expr(c) > lit(hi)), 1L)
          .otherwise(0L)), lit(0L)).as(s"v$i")
      case (Matches(c, re), i) =>
        coalesce(sum(when(expr(c).isNotNull && !expr(c).rlike(re), 1L)
          .otherwise(0L)), lit(0L)).as(s"v$i")
      case (Unique(c), i) =>
        (count(lit(1)) - countDistinct(expr(c))).as(s"v$i")
      case (r, _) => throw new MatchError(r)
    }

  /** The (rule, violations) structs matching [[ruleAggs]]'s output names. */
  private def rulePairs(
      rowLocal: Seq[Rule]): org.apache.spark.sql.Column =
    array(rowLocal.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"v$i").as("violations"))
    }: _*)
}
