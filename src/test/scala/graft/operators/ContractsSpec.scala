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

  test("an empty input trivially passes every rule — violations 0, never NULL") {
    val empty = df.filter(org.apache.spark.sql.functions.lit(false))
    val ref = Seq(1L).toDF("k")
    val got = audit(empty, "t",
      Seq(NotNull("name"), InRange("v", 0, 1), Matches("name", "x"),
        Unique("id"), SubsetOf("id", ref, "k"))).collect()
    assert(got.length == 5)
    got.foreach { r =>
      assert(!r.isNullAt(3) && r.getLong(3) == 0L,
        s"${r.getString(1)}: violations must be 0 on empty input, got $r")
      assert(!r.isNullAt(4) && r.getBoolean(4),
        s"${r.getString(1)}: empty input must pass, got $r")
    }
  }

  test("two referential rules share one total-count (single materialized total)") {
    val ref = Seq(1L, 2L, 3L).toDF("k")
    val got = counts(Seq(SubsetOf("id", ref, "k"), SubsetOf("v", ref, "k")))
    assert(got("subset_of(id)") == ((5L, 1L, false)))
    assert(got("subset_of(v)")._1 == 5L)
  }

  test("auditStreamWindowed emits per-window verdicts under a watermark (update mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val sink = s"contracts_w_${System.nanoTime()}"
    val q = auditStreamWindowed(stream.toDF().toDF("ts", "id", "v"), "s",
      Seq(InRange("v", 0.0, 100.0), NotNull("id")),
      "ts", "10 seconds", "30 seconds")
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    try {
      stream.addData((t(5), 1L, 10.0), (t(7), 2L, 500.0), (t(15), 3L, 50.0))
      q.processAllAvailable()
      val rows = spark.table(sink).collect().map(r =>
        (r.getTimestamp(1).getTime / 1000, r.getString(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
      assert(rows.contains((0L, "in_range(v)", 2L, 1L, false)),
        s"window [0,10) must fail in_range: $rows")
      assert(rows.contains((10L, "in_range(v)", 1L, 0L, true)),
        s"window [10,20) must pass in_range: $rows")
      assert(rows.contains((0L, "not_null(id)", 2L, 0L, true)))

      // a second trigger UPDATES the open [0,10) window cumulatively
      stream.addData((t(8), 4L, -3.0))
      q.processAllAvailable()
      val r2 = spark.table(sink).collect().map(r =>
        (r.getTimestamp(1).getTime / 1000, r.getString(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
      assert(r2.contains((0L, "in_range(v)", 3L, 2L, false)),
        s"the [0,10) verdict must revise to 2 violations of 3 rows: $r2")
    } finally q.stop()
  }

  test("auditStreamWindowed refuses referential and unique rules") {
    intercept[IllegalArgumentException] {
      auditStreamWindowed(df, "t", Seq(Unique("id")), "v", "10 seconds", "0 seconds")
    }
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
