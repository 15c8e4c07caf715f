package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftFunctions, SparkTestSession}
import graft.streaming.FrameFixtures

class MotionSummarySpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("aggregator golden: counts, motion frames, totals, max; null = unknown") {
    // regions per frame: null (first frame), 0, 2, 3, 0
    val in: Seq[java.lang.Integer] = Seq(null, 0, 2, 3, 0).map {
      case null => null.asInstanceOf[java.lang.Integer]
      case i: Int => java.lang.Integer.valueOf(i)
    }
    val got = in.foldLeft(MotionSummary.aggregator.zero)(MotionSummary.aggregator.reduce)
    assert(got == MotionSummary.Buf(5, 4, 2, 5, 3))
    // merge is associative with the same answer; -1 behaves like null
    val (l, r) = (
      Seq[java.lang.Integer](-1, 0).foldLeft(MotionSummary.aggregator.zero)(
        MotionSummary.aggregator.reduce),
      Seq[java.lang.Integer](2, 3, 0).foldLeft(MotionSummary.aggregator.zero)(
        MotionSummary.aggregator.reduce))
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
    // NO coalesce: the raw NULL from motion_region_count must land in the
    // aggregator's unknown branch by itself
    val rows = spark.sql(
      s"""WITH scored AS (
            SELECT camId, motion_region_count(
              lag(px) OVER (PARTITION BY camId ORDER BY seq), px,
              ${FrameFixtures.Rows}, ${FrameFixtures.Cols}, ${FrameFixtures.MatTypeC3}) AS n
            FROM frames_udaf)
          SELECT camId, motion_summary(n) AS s FROM scored GROUP BY camId ORDER BY camId""")
      .collect().map(r => r.getString(0) -> r.getStruct(1).toSeq).toMap
    assert(rows("camA") == Seq(3L, 2L, 1L, 1L, 1L)) // 3 frames, 2 scored, 1 motion
    assert(rows("camB") == Seq(1L, 0L, 0L, 0L, 0L))
  }
}
