package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BinaryType, IntegerType}

import graft.expressions.{DeflateLen, MotionRegionCount, RegexpCount, SigAgreement, VectorDot}

/** Engine SQL surface registration.
  *
  * Two ways in:
  *  - config `spark.sql.extensions=graft.GraftExtensions` (cluster-wide), or
  *  - [[GraftFunctions.register]] on a live session (tests, notebooks) —
  *    functions only; the optimizer rule needs the extensions config (or
  *    `spark.experimental.extraOptimizations`, which is what the specs use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.CollapseRegexpCount)
  }
}

object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val all: Seq[FunctionDescription] = Seq(
    (new FunctionIdentifier("motion_region_count"),
      new ExpressionInfo(classOf[MotionRegionCount].getName, "motion_region_count"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          s"motion_region_count expects 5 arguments, got ${args.length}")
        def bin(e: Expression) = if (e.dataType == BinaryType) e else Cast(e, BinaryType)
        def int(e: Expression) = if (e.dataType == IntegerType) e else Cast(e, IntegerType)
        MotionRegionCount(bin(args(0)), bin(args(1)), int(args(2)), int(args(3)), int(args(4)))
      }),
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"vec_dot expects 2 arguments, got ${args.length}")
        def arr(e: Expression) =
          if (e.dataType == org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)) e
          else Cast(e, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
        VectorDot(arr(args(0)), arr(args(1)))
      }),
    (new FunctionIdentifier("regexp_count"),
      new ExpressionInfo(classOf[RegexpCount].getName, "regexp_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"regexp_count expects 2 arguments, got ${args.length}")
        def str(e: Expression) =
          if (e.dataType == org.apache.spark.sql.types.StringType) e
          else Cast(e, org.apache.spark.sql.types.StringType)
        RegexpCount(str(args(0)), str(args(1)))
      }),
    (new FunctionIdentifier("sig_agreement"),
      new ExpressionInfo(classOf[SigAgreement].getName, "sig_agreement"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"sig_agreement expects 2 arguments, got ${args.length}")
        def arr(e: Expression) =
          if (e.dataType == org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)) e
          else Cast(e, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
        SigAgreement(arr(args(0)), arr(args(1)))
      }),
    (new FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"deflate_len expects 1 argument, got ${args.length}")
        def str(e: Expression) =
          if (e.dataType == org.apache.spark.sql.types.StringType) e
          else Cast(e, org.apache.spark.sql.types.StringType)
        DeflateLen(str(args(0)))
      }))

  /** Register all engine functions on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
