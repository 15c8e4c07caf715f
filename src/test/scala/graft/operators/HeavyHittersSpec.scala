package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Heavy hitters: the exact path against a hand count, and the Misra–Gries
  * sketch against its published guarantees (presence above N/(k+1);
  * undercount bounded by N/(k+1)) — checked across a partitioned input so
  * the mergeable-summaries combine step is actually exercised.
  */
class HeavyHittersSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // skewed stream: "a"×500, "b"×300, "c"×120, then 80 distinct singletons
  // → N = 1000
  private def skewed = {
    val rows = Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ Seq.fill(120)("c") ++
      (0 until 80).map(i => s"tail$i")
    rows.toDF("item").repartition(7) // force multi-partition merges
  }

  test("exact: counts and 6-dp shares above the threshold, nothing below") {
    val got = HeavyHitters.exact(skewed, "item", minShare = 0.1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("a", 500L, 0.5), ("b", 300L, 0.3), ("c", 120L, 0.12)))
  }

  test("exact: threshold is inclusive (n >= total*minShare)") {
    val got = HeavyHitters.exact(skewed, "item", minShare = 0.12)
      .select("item").as[String].collect().toSet
    assert(got == Set("a", "b", "c")) // c is exactly at 12%
  }

  test("sketch: every item above N/(k+1) is present, estimates undercount by <= N/(k+1)") {
    val k = 9 // N/(k+1) = 100 → a, b, c are guaranteed survivors
    val truth = Map("a" -> 500L, "b" -> 300L, "c" -> 120L)
    val got = HeavyHitters.sketch(skewed, "item", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bound = 1000L / (k + 1)
    assert(got.forall(_._3 == 1000L), "n_total must be the full stream size")
    assert(got.forall(_._4 == bound), "max_undercount must be floor(N/(k+1))")
    val ests = got.map(r => r._1 -> r._2).toMap
    truth.foreach { case (item, n) =>
      assert(ests.contains(item), s"guaranteed hitter $item missing")
      val est = ests(item)
      assert(est <= n && n <= est + bound,
        s"$item: est $est out of [${n - bound}, $n]")
    }
    // every reported estimate is a lower bound on some true count >= est
    val exact = skewed.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (item, est, _, _) =>
      assert(est <= exact(item), s"$item overcounted: $est > ${exact(item)}")
    }
    assert(got.length <= k, "at most k counters survive")
  }

  test("sketch: partition layout does not break the bounds (single vs many)") {
    val single = skewed.coalesce(1)
    val got = HeavyHitters.sketch(single, "item", 9)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("a", "b", "c").subsetOf(got.keySet))
  }

  test("sketch: null items are ignored, not counted") {
    val withNulls = Seq(Some("x"), None, Some("x"), None, Some("y"))
      .toDF("item")
    val got = HeavyHitters.sketch(withNulls, "item", 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.forall(_._3 == 3L), "n_total counts non-null items only")
    assert(got.map(_._1).toSet == Set("x", "y"))
  }

  test("count-min: est >= exact for EVERY probe, within the eps*N bound on a skewed stream") {
    // 2000 rows over ~120 distinct items, heavy head — the regime CM is for
    val rnd = new scala.util.Random(7)
    val stream = (1 to 2000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 40) "hot" else if (r < 60) s"warm${r % 5}" else s"cold${rnd.nextInt(100)}"
    }.toDF("item")
    val probes = stream.distinct()
    val got = HeavyHitters.cmEstimates(stream, "item", probes, "item",
        depth = 4, width = 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // hard invariant: counters only ever add, so est can never undercount
    got.foreach { case (item, exact, est, over, _) =>
      assert(est >= exact, s"$item undercounted: $est < $exact")
      assert(over == est - exact)
    }
    // the eps*N guarantee holds per-probe w.p. 1 - e^-depth (~98% at d=4);
    // on this fixed seed, every probe lands inside it
    got.foreach { case (item, _, _, over, bound) =>
      assert(over <= bound, s"$item overcount $over exceeds bound $bound")
    }
    // the probe absent from the stream estimates only collision mass
    val ghost = HeavyHitters.cmEstimates(stream, "item",
        Seq("never-seen").toDF("item"), "item", depth = 4, width = 256)
      .collect().head
    assert(ghost.getLong(1) == 0L && ghost.getLong(2) <= ghost.getLong(4))
  }

  test("count-min: partition layout does not change the sketch (merge is pointwise sum)") {
    val stream = (1 to 500).map(i => s"item${i % 17}").toDF("item")
    def run(df: org.apache.spark.sql.DataFrame) =
      HeavyHitters.cmEstimates(df, "item", df.distinct(), "item", depth = 3, width = 64)
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(run(stream.coalesce(1)) == run(stream.repartition(7)),
      "estimates must be identical however the stream was partitioned")
  }
}
