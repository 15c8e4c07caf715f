package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Accuracy gates for the approximate operators the DuckDB oracle cannot
  * check (sketches are engine-specific): each approximate query is compared
  * against its exact twin at the correctness-gate SF, so "approximately
  * right" is a measured bound, not a claim.
  */
class ApproxSpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q13b approx_count_distinct stays within 3 rsd of the exact count per group") {
    // rsd=0.02 is a 1-sigma figure, not a hard bound — HLL lands past 1 rsd
    // ~32% of the time at large cardinalities. 3 rsd (6%) is the envelope a
    // correct estimator essentially never exceeds, so a failure here means
    // a real defect, not estimator luck.
    val exact = run("q13_count_distinct")
      .select("event_type", "n_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = run("q13b_approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (g, a) =>
      val e = exact(g)
      assert(math.abs(a - e) <= math.max(2L, (0.06 * e).toLong),
        s"group $g: approx $a vs exact $e exceeds the 3-rsd (6%) envelope")
    }
  }

  test("q31b approx percentiles land inside the exact ±5%-rank band per group") {
    // rank-based bound: approx_percentile(accuracy 10000) returns a real
    // element whose rank error is far below 5%, so the value must sit
    // between the exact 45th/55th (resp. 88th/92nd) percentiles
    val bands = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.45)").as("p50_lo"),
        expr("percentile(value, 0.55)").as("p50_hi"),
        expr("percentile(value, 0.88)").as("p90_lo"),
        expr("percentile(value, 0.92)").as("p90_hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = run("q31b_approx_percentiles").collect()
    assert(approx.length == bands.size)
    approx.foreach { r =>
      val (p50lo, p50hi, p90lo, p90hi) = bands(r.getString(0))
      val p50 = r.getDouble(1); val p90 = r.getDouble(2)
      assert(p50 >= p50lo && p50 <= p50hi, s"${r.getString(0)}: p50 $p50 outside [$p50lo,$p50hi]")
      assert(p90 >= p90lo && p90 <= p90hi, s"${r.getString(0)}: p90 $p90 outside [$p90lo,$p90hi]")
    }
  }

  private def meanRecall(name: String): Double = {
    val rows = run(name).collect()
    assert(rows.length == 8, s"$name: expected one recall row per query, got ${rows.length}")
    rows.map(_.getAs[Double]("recall")).sum / rows.length
  }

  test("ext16 multi-table LSH mean recall@5 clears the declared floor") {
    val r = meanRecall("ext16_ann_lsh_recall")
    assert(r >= 0.5, s"LSH mean recall $r below the 0.5 floor (8 tables x 4 bits)")
  }

  test("ext17 IVF mean recall@5 clears the declared floor") {
    val r = meanRecall("ext17_ann_ivf_recall")
    assert(r >= 0.4, s"IVF mean recall $r below the 0.4 floor (nProbe 2 of 8 lists)")
  }

  test("ext67 minhash estimates track exact shingle Jaccard within the 64-perm envelope") {
    val rows = run("ext67_minhash_accuracy").collect()
    assert(rows.nonEmpty, "LSH produced no candidate pairs at the gate SF")
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      assert(est >= 0.0 && est <= 1.0)
    }
    val meanErr = rows.map(_.getAs[Double]("abs_err")).sum / rows.length
    // 64 permutations → σ ≈ sqrt(J(1-J)/64) ≤ 0.0625; mean |err| across
    // pairs sits well under 2σ unless the estimator or the exact side is
    // broken (shingle-universe mismatch shows up here immediately)
    assert(meanErr <= 0.12, s"mean |est - exact| = $meanErr exceeds the envelope")
  }

  test("ext62 IVF-PQ mean recall@5 is at least plain IVF's floor (same lists, + exact refine)") {
    // PQ prunes candidates the same lists give IVF, and the refine stage
    // re-ranks exactly — so its recall can't collapse below the IVF floor
    val r = meanRecall("ext62_ann_ivfpq_recall")
    assert(r >= 0.4, s"IVF-PQ mean recall $r below the 0.4 floor (nProbe 2 of 8 lists, refine 4k)")
  }
}
