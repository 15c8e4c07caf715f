package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.expressions.RegexpCount

/** Optimizer rule: `size(regexp_extract_all(s, re, 0))` →
  * [[graft.expressions.RegexpCount]].
  *
  * The built-in composition materializes every match as a UTF8String in an
  * array only to take its length; the fused expression runs one matcher
  * loop. Catalog code keeps the portable built-in form (it must also run as
  * the DuckDB oracle's `len(regexp_extract_all(...))`), and any session
  * with the engine extensions installed (`spark.sql.extensions=
  * graft.GraftExtensions`) gets the cheap plan transparently.
  *
  * The rewrite only fires when the pattern is FOLDABLE (a non-foldable
  * pattern would trade the built-in's lastRegex per-value compile cache for
  * RegexpCount's per-row compile fallback — a pessimization), only for
  * group index 0 (whole-match extraction — group extraction counts the
  * same, but keeping the trigger narrow keeps the equivalence proof
  * trivial), and only for the non-legacy `size` null semantics
  * (`size(null) = null`, matching RegexpCount; legacy mode returns -1 and
  * must keep the built-in).
  */
object CollapseRegexpCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(RegExpExtractAll(subject, regexp, Literal(0, IntegerType)), false)
        if regexp.foldable =>
      RegexpCount(subject, regexp)
  }
}
