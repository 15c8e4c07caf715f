package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: entry() smoke rows, full catalog coverage of
  * queries/oracles, and name hygiene.
  */
class SparkEntrySpec extends AnyFunSuite with SparkTestSession {

  test("entry() returns rows and exercises pipeline + relational halves") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 2) // one per generated camera
    rows.foreach { r =>
      assert(r.getAs[Long]("n_frames") == 3L)
      assert(r.getAs[Long]("n_brands") > 0L)
    }
  }

  test("every oracle key has a query; names are unique") {
    val qnames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qnames))
    assert(SparkEntry.all.map(_.name).distinct.size == SparkEntry.all.size)
  }

  test("each query builds a plan on sf0.001 without execution errors") {
    // analysis-time check across the whole catalog (cheap — no execution)
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.nonEmpty, name)
    }
  }
}
