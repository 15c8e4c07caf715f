package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LayoutSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("interleaveBits golden values") {
    val r = Seq((3L, 2L)).toDF("x", "y")
      .select(
        Layout.interleaveBits(col("x"), col("y"), 2).as("z32"),
        Layout.interleaveBits(col("x"), col("y"), 8).as("z8"),
        Layout.interleaveBits(lit(0L), lit(0L), 16).as("zero"),
        Layout.interleaveBits(lit(0xFFFFL), lit(0xFFFFL), 16).as("all"))
      .head()
    // x=0b11 at even positions, y=0b10 at odd: 1 + 4 + 8 = 13
    assert(r.getLong(0) == 13L)
    assert(r.getLong(1) == 13L) // higher width, same low bits
    assert(r.getLong(2) == 0L)
    assert(r.getLong(3) == (1L << 32) - 1) // 32 set bits
  }

  // a 32×32 grid: ids 0..1023, x = id mod 32, y = id div 32
  private def grid = spark.range(1024)
    .select(col("id"), (col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))

  test("zorder preserves the row set") {
    val out = Layout.zorder(grid, "x", "y", nParts = 8)
    assert(out.count() == 1024)
    assert(out.select("id").distinct().count() == 1024)
  }

  test("z-ordered partitions are narrow in BOTH dimensions; a single-column sort is not") {
    val z = Layout.zorderAudit(grid, "x", "y", nParts = 8).collect()
    assert(z.length >= 2, "expected multiple non-empty partitions")
    def avg(xs: Seq[Double]) = xs.sum / xs.length
    val zx = avg(z.map(_.getAs[Double]("x_span_frac")).toSeq)
    val zy = avg(z.map(_.getAs[Double]("y_span_frac")).toSeq)
    assert(zx <= 0.6, s"z-order avg x span $zx should be narrow")
    assert(zy <= 0.6, s"z-order avg y span $zy should be narrow")
    // the single-column layout prunes x but reads ~every partition for a
    // y predicate — that contrast is the point of the operator
    val xSorted = grid.repartitionByRange(8, col("x"))
      .select(spark_partition_id().as("pid"), col("y").cast("double").as("y"))
      .groupBy("pid").agg(((max("y") - min("y")) / 31.0).as("span"))
      .collect().map(_.getAs[Double]("span")).toSeq
    assert(avg(xSorted) >= 0.9, s"x-sorted layout should have ~full y spans, got ${avg(xSorted)}")
  }
}
