package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Contract-audit semantics: exact violation counts per rule class, the
  * null-handling contract (nulls violate only not_null), and the
  * single-scan compilation of row-local rules.
  */
class ContractsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._
  import Contracts._

  private val df = Seq(
    (1L, Some("alpha"), 10.0),
    (2L, Some("beta"), -5.0),
    (3L, None, 700.0),
    (3L, Some("GAMMA"), 50.0),
    (4L, Some("alpha"), 50.0)).toDF("id", "name", "v")

  private def counts(rules: Seq[Rule]) =
    audit(df, "t", rules).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap

  test("row-local rules count exact violations; nulls only hit not_null") {
    val got = counts(Seq(
      NotNull("name"),             // one null
      InRange("v", 0.0, 100.0),    // -5 and 700 out of range (null-free col)
      Matches("name", "^[a-z]+$"), // GAMMA fails; the NULL row is skipped
      Unique("id"),                // id 3 twice -> 1 surplus
      Unique("name")))             // 'alpha' twice; NULL distinct-ignored
    assert(got("not_null(name)") == ((5L, 1L, false)))
    assert(got("in_range(v)") == ((5L, 2L, false)))
    assert(got("matches(name)") == ((5L, 1L, false)))
    assert(got("unique(id)") == ((5L, 1L, false)))
    // count(*)=5 minus countDistinct(name)=3 (NULL ignored) = 2
    assert(got("unique(name)") == ((5L, 2L, false)))
  }

  test("subset_of counts non-null keys missing from the reference") {
    val ref = Seq(1L, 2L, 3L).toDF("k")
    val got = counts(Seq(SubsetOf("id", ref, "k"), NotNull("id")))
    assert(got("subset_of(id)") == ((5L, 1L, false))) // id 4 unmatched
    assert(got("not_null(id)") == ((5L, 0L, true)))
  }

  test("all row-local rules compile into ONE scan of the input") {
    val plan = audit(df, "t",
      Seq(NotNull("name"), InRange("v", 0, 1), Matches("name", "x"),
        Unique("id")))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size == 1,
      s"expected a single input scan:\n$plan")
  }

  test("an empty rule set is rejected") {
    intercept[IllegalArgumentException] { audit(df, "t", Seq.empty) }
  }

  test("auditStream emits cumulative verdicts per trigger (complete mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Double)]
    val sink = s"contracts_${System.nanoTime()}"
    val q = auditStream(stream.toDF().toDF("id", "v"), "s",
      Seq(InRange("v", 0.0, 100.0), NotNull("id")))
      .writeStream.format("memory").queryName(sink).outputMode("complete")
      .start()
    try {
      stream.addData((1L, 10.0), (2L, 50.0))
      q.processAllAvailable()
      val r1 = spark.table(sink).collect()
        .map(r => r.getString(1) -> ((r.getLong(3), r.getBoolean(4)))).toMap
      assert(r1("in_range(v)") == ((0L, true)) && r1("not_null(id)") == ((0L, true)))

      stream.addData((2L, 500.0)) // out of range
      q.processAllAvailable()
      val r2 = spark.table(sink).collect()
        .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
        .toMap
      assert(r2("in_range(v)") == ((3L, 1L, false)),
        "cumulative range violation must surface after batch 2")
      assert(r2("not_null(id)") == ((3L, 0L, true)))
    } finally q.stop()
  }

  test("auditStream refuses referential and unique rules") {
    intercept[IllegalArgumentException] {
      auditStream(df, "t", Seq(SubsetOf("id", df, "id")))
    }
    intercept[IllegalArgumentException] {
      auditStream(df, "t", Seq(Unique("id")))
    }
  }
}
