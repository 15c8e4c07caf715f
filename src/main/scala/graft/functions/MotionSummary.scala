package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** UDAF surface (SURVEY.md §2.B): a typed `Aggregator` summarizing per-frame
  * motion observations into one row per group.
  *
  * Input is a per-frame region count; NULL or -1 mean unknown (e.g. the
  * first frame of a camera, which has no previous frame — exactly what
  * `motion_region_count` returns NULL for). The input type is boxed so a
  * NULL row reaches the unknown branch instead of being silently decoded
  * as 0 motion-free.
  * Output: (n_frames, n_scored, n_motion, total_regions, max_regions).
  *
  * Scale: the merge is associative/commutative with a constant-size buffer,
  * so Spark executes it as partial aggregation before the shuffle — group
  * state is 5 longs regardless of input size.
  */
object MotionSummary {

  final case class Buf(
      nFrames: Long, nScored: Long, nMotion: Long,
      totalRegions: Long, maxRegions: Long)

  val aggregator: Aggregator[java.lang.Integer, Buf, Buf] =
    new Aggregator[java.lang.Integer, Buf, Buf] {
    override def zero: Buf = Buf(0L, 0L, 0L, 0L, 0L)
    override def reduce(b: Buf, boxed: java.lang.Integer): Buf = {
      val regions = if (boxed == null) -1 else boxed.intValue()
      if (regions < 0) b.copy(nFrames = b.nFrames + 1)
      else Buf(
        b.nFrames + 1,
        b.nScored + 1,
        b.nMotion + (if (regions > 0) 1L else 0L),
        b.totalRegions + regions,
        math.max(b.maxRegions, regions.toLong))
    }
    override def merge(a: Buf, b: Buf): Buf = Buf(
      a.nFrames + b.nFrames, a.nScored + b.nScored, a.nMotion + b.nMotion,
      a.totalRegions + b.totalRegions, math.max(a.maxRegions, b.maxRegions))
    override def finish(b: Buf): Buf = b
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Register as SQL UDAF `motion_summary(int)`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("motion_summary", udaf(aggregator))
}
