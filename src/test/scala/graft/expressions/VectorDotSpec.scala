package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftFunctions, SparkTestSession}
import graft.functions.VectorFunctions

/** The codegen'd dot product must agree bit-for-bit with the
  * higher-order-function form on every edge case the HOF handles.
  */
class VectorDotSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("vec_dot equals the HOF dot on regular, empty, and irregular inputs") {
    val rows = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)), // 32.0
      (Seq.empty[Double], Seq.empty[Double]), // 0.0
      (Seq(1.5), Seq(-2.0)), // -3.0
      (Seq(1.0, 2.0), Seq(1.0)), // length mismatch → null
      (Seq(0.1, 0.2, 0.3), Seq(0.3, 0.2, 0.1))
    ).toDF("a", "b")
    val got = rows.select(
      VectorFunctions.dot(col("a"), col("b")).as("fast"),
      VectorFunctions.dotHof(col("a"), col("b")).as("ref")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(got(0).getDouble(0) == 32.0)
    assert(got(1).getDouble(0) == 0.0)
    assert(got(3).isNullAt(0))
  }

  test("null element or null array yields NULL in both forms") {
    val df = spark.sql(
      """SELECT * FROM VALUES
           (array(1.0d, cast(null as double)), array(1.0d, 2.0d)),
           (cast(null as array<double>), array(1.0d, 2.0d))
         AS t(a, b)""")
    val got = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("fast"),
      VectorFunctions.dotHof(col("a"), col("b")).as("ref")).collect()
    got.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1)))
  }

  test("registered SQL function vec_dot works and casts float arrays") {
    GraftFunctions.register(spark)
    val v = spark.sql(
      "SELECT vec_dot(array(cast(2.0 as float), cast(3.0 as float)), array(4.0d, 5.0d)) AS d")
      .head.getDouble(0)
    assert(v == 23.0)
  }
}
