package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftFunctions, SparkTestSession}
import graft.streaming.FrameFixtures

class MotionSummarySpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("aggregator golden: counts, motion frames, totals, max") {
    // regions per frame: -1 (first frame), 0, 2, 3, 0
    val got = Seq(-1, 0, 2, 3, 0).foldLeft(MotionSummary.aggregator.zero)(
      MotionSummary.aggregator.reduce)
    assert(got == MotionSummary.Buf(5, 4, 2, 5, 3))
    // merge is associative with the same answer
    val (l, r) = (Seq(-1, 0).foldLeft(MotionSummary.aggregator.zero)(MotionSummary.aggregator.reduce),
      Seq(2, 3, 0).foldLeft(MotionSummary.aggregator.zero)(MotionSummary.aggregator.reduce))
    assert(MotionSummary.aggregator.merge(l, r) == got)
  }

  test("SQL UDAF composes with the codegen'd expression over a frame table") {
    GraftFunctions.register(spark)
    MotionSummary.register(spark)
    val px = (x: Int) => FrameFixtures.pixels(x, 10)
    // camA: A→B→B (motion on frame 2), camB: single frame (unknown)
    Seq(
      ("camA", 1L, px(FrameFixtures.PosA)),
      ("camA", 2L, px(FrameFixtures.PosB)),
      ("camA", 3L, px(FrameFixtures.PosB)),
      ("camB", 1L, px(FrameFixtures.PosA))
    ).toDF("camId", "seq", "px").createOrReplaceTempView("frames_udaf")
    val rows = spark.sql(
      s"""WITH scored AS (
            SELECT camId, coalesce(motion_region_count(
              lag(px) OVER (PARTITION BY camId ORDER BY seq), px,
              ${FrameFixtures.Rows}, ${FrameFixtures.Cols}, ${FrameFixtures.MatTypeC3}), -1) AS n
            FROM frames_udaf)
          SELECT camId, motion_summary(n) AS s FROM scored GROUP BY camId ORDER BY camId""")
      .collect().map(r => r.getString(0) -> r.getStruct(1).toSeq).toMap
    assert(rows("camA") == Seq(3L, 2L, 1L, 1L, 1L)) // 3 frames, 2 scored, 1 motion
    assert(rows("camB") == Seq(1L, 0L, 0L, 0L, 0L))
  }
}
