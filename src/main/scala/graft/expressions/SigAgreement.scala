package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd agreement count over two `array<long>` MinHash signatures:
  * the number of positions (over the shorter length) where both elements
  * are non-null and equal.
  *
  * Semantically identical to the higher-order-function form
  * `size(filter(zip_with(a, b, (x, y) => x === y), p => p))` for the
  * operator's fixed-length never-null signatures (cross-checked in
  * SketchExpressionsSpec), but one primitive loop instead of a zipped
  * boolean intermediate + two interpreted lambda dispatches per element.
  * MinHash-LSH scoring calls this once per UNIQUE candidate pair — the
  * documented cost center of [[graft.operators.Dedup.minHashLsh]].
  */
case class SigAgreement(left: Expression, right: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(left, right)

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sig_agreement expects (array<bigint>, array<bigint>), got " +
        s"(${children.map(_.dataType.simpleString).mkString(", ")})")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = math.min(aa.numElements(), bb.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!aa.isNullAt(i) && !bb.isNullAt(i) && aa.getLong(i) == bb.getLong(i))
        agree += 1
      i += 1
    }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val le = left.genCode(ctx)
    val re = right.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val agree = ctx.freshName("agree")
    ev.copy(code =
      code"""
        ${le.code}
        ${re.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = 0;
        if (!(${le.isNull}) && !(${re.isNull})) {
          int $n = java.lang.Math.min(
            ${le.value}.numElements(), ${re.value}.numElements());
          int $agree = 0;
          for (int $i = 0; $i < $n; $i++) {
            if (!${le.value}.isNullAt($i) && !${re.value}.isNullAt($i)
                && ${le.value}.getLong($i) == ${re.value}.getLong($i)) {
              $agree++;
            }
          }
          ${ev.isNull} = false;
          ${ev.value} = $agree;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))

  override def prettyName: String = "sig_agreement"
}
