package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

/** Codegen'd count of non-overlapping regex matches in a string — the
  * result of `size(regexp_extract_all(str, regex, 0))` WITHOUT materializing
  * the match array (one matcher loop, no per-match UTF8String allocations,
  * no array copy). [[graft.plans.CollapseRegexpCount]] rewrites that exact
  * built-in composition to this expression, so catalog code keeps using the
  * portable built-ins and sessions with the engine extensions installed get
  * the cheap plan transparently; SQL users can also call `regexp_count`
  * directly.
  *
  * A foldable pattern (the overwhelmingly common case — every
  * [[graft.functions.Redaction]] count is a literal pattern) is compiled
  * ONCE on the driver and shipped as a reference object; a non-foldable
  * pattern compiles per row, same as Spark's own RLike fallback.
  */
case class RegexpCount(str: Expression, regex: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(str, regex)

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"regexp_count expects (string, string), got " +
        s"(${children.map(_.dataType.simpleString).mkString(", ")})")
  }

  @transient private lazy val foldedPattern: Pattern =
    if (regex.foldable) {
      val r = regex.eval(null)
      if (r == null) null else Pattern.compile(r.toString)
    } else null

  override def eval(input: InternalRow): Any = {
    val s = str.eval(input)
    if (s == null) return null
    val p =
      if (regex.foldable) foldedPattern
      else {
        val r = regex.eval(input)
        if (r == null) null else Pattern.compile(r.toString)
      }
    if (p == null) return null
    RegexpCount.countMatches(p, s.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val se = str.genCode(ctx)
    val cls = classOf[RegexpCount].getName
    if (regex.foldable) {
      // compile once on the driver, ship the Pattern (Serializable) as a
      // reference object — zero per-row or per-partition compile cost
      val patRef =
        if (foldedPattern == null) null
        else ctx.addReferenceObj("regexpCountPattern", foldedPattern,
          classOf[Pattern].getName)
      if (patRef == null)
        return ev.copy(code =
          code"""
            boolean ${ev.isNull} = true;
            int ${ev.value} = 0;
          """)
      ev.copy(code =
        code"""
          ${se.code}
          boolean ${ev.isNull} = true;
          int ${ev.value} = 0;
          if (!(${se.isNull})) {
            ${ev.value} = $cls.countMatches($patRef, ${se.value}.toString());
            ${ev.isNull} = false;
          }
        """)
    } else {
      val re = regex.genCode(ctx)
      ev.copy(code =
        code"""
          ${se.code}
          ${re.code}
          boolean ${ev.isNull} = true;
          int ${ev.value} = 0;
          if (!(${se.isNull}) && !(${re.isNull})) {
            ${ev.value} = $cls.countMatches(
              java.util.regex.Pattern.compile(${re.value}.toString()),
              ${se.value}.toString());
            ${ev.isNull} = false;
          }
        """)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(str = newChildren(0), regex = newChildren(1))

  override def prettyName: String = "regexp_count"
}

object RegexpCount {
  /** Java's Matcher.find() bumps past zero-width matches, so this
    * terminates for any pattern. Public static so generated code can call
    * it.
    */
  def countMatches(p: Pattern, s: String): Int = {
    val m = p.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }
}
