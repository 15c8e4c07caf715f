package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.Redaction

class RegexpCountSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  import org.apache.spark.sql.graft.ColumnGlue

  private def regexpCount(s: Column, re: Column): Column =
    ColumnGlue.column(RegexpCount(ColumnGlue.expression(s), ColumnGlue.expression(re)))

  private val texts = Seq(
    "a@b.co c@d.org 10.1.1.1 25-111-222-3333",
    "no matches here",
    "",
    null.asInstanceOf[String],
    "aaa aa a").toDF("t")

  test("counts match size(regexp_extract_all(.., 0)) for every pattern and input") {
    for (re <- Seq(Redaction.emailRe, Redaction.phoneRe, Redaction.ipv4Re, "a+")) {
      val both = texts.select(
        size(regexp_extract_all(col("t"), lit(re), lit(0))).as("builtin"),
        regexpCount(col("t"), lit(re)).as("fused")).collect()
      both.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1), s"null disagreement for /$re/")
        if (!r.isNullAt(0)) assert(r.getInt(0) == r.getInt(1), s"count disagreement for /$re/")
      }
    }
  }

  test("optimizer rule rewrites the built-in composition to regexp_count") {
    spark.experimental.extraOptimizations ++= Seq(graft.plans.CollapseRegexpCount)
    try {
      // a file-backed relation — a LocalRelation would be constant-folded
      // away before the plan could show the rewrite
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val q = docs.select(
        size(regexp_extract_all(col("text"), lit("a+"), lit(0))).as("n"))
      assert(q.queryExecution.optimizedPlan.toString.contains("regexp_count"),
        "rule did not fire on size(regexp_extract_all(.., 0))")
      assert(q.collect().map(_.getInt(0)).toSeq
        == docs.select(size(regexp_extract_all(col("text"), lit("a+"), lit(0))))
          .collect().map(_.getInt(0)).toSeq)
      // group-index != 0 must NOT rewrite (narrow trigger)
      val grouped = docs.select(
        size(regexp_extract_all(col("text"), lit("(a)+"), lit(1))))
      assert(!grouped.queryExecution.optimizedPlan.toString.contains("regexp_count"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.CollapseRegexpCount)
    }
  }

  test("registered SQL function regexp_count works and casts its arguments") {
    graft.GraftFunctions.register(spark)
    val r = spark.sql("SELECT regexp_count('aaa bb a', 'a+') AS n").head()
    assert(r.getInt(0) == 2)
  }

  test("non-foldable pattern column still evaluates (per-row compile fallback)") {
    val d = Seq(("aaa", "a"), ("aaa", "aa"), ("abc", "[bc]")).toDF("t", "re")
    val got = d.select(regexpCount(col("t"), col("re"))).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(3, 1, 2))
  }

  test("zero-width-capable patterns terminate and agree with the built-in") {
    val d = Seq("abc", "").toDF("t")
    val both = d.select(
      size(regexp_extract_all(col("t"), lit("x*"), lit(0))).as("b"),
      regexpCount(col("t"), lit("x*")).as("f")).collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
