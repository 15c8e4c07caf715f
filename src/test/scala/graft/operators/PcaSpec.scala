package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Distributed PCA: the one-pass moment aggregator against a driver-side
  * reference computation, the Jacobi eigensolve against known spectra, and
  * the projection's Parseval residuals — the invariants that make a
  * rows-only driver entry trustworthy.
  */
class PcaSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def assertClose(a: Double, b: Double, tol: Double = 1e-9): Unit =
    assert(math.abs(a - b) <= tol, s"$a vs $b (tol $tol)")

  test("jacobiEigen recovers a known diagonal-plus-rotation spectrum") {
    // A = Q diag(9, 4, 1) Qᵀ for a hand-built rotation Q
    val c = math.cos(0.3); val s = math.sin(0.3)
    val q = Array(
      Array(c, -s, 0.0),
      Array(s, c, 0.0),
      Array(0.0, 0.0, 1.0))
    val d = Array(9.0, 4.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => q(i)(k) * d(k) * q(j)(k)).sum)
    val (evals, evecs) = Pca.jacobiEigen(a)
    assertClose(evals(0), 9.0); assertClose(evals(1), 4.0); assertClose(evals(2), 1.0)
    // eigenvectors orthonormal with pinned (positive-pivot) signs
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = (0 until 3).map(k => evecs(i)(k) * evecs(j)(k)).sum
      assertClose(dot, if (i == j) 1.0 else 0.0, 1e-9)
    }
    assert(evecs.forall(v => v(v.indices.maxBy(k => (math.abs(v(k)), -k))) > 0))
  }

  test("fit matches a driver-side covariance eigensolve on random-ish data") {
    val d = 5
    // deterministic pseudo-random vectors (no Math.random in specs)
    val rows = (0 until 200).map { i =>
      (i.toLong, (0 until d).map(j =>
        math.sin(i * 0.7 + j * 1.3) * (j + 1) + math.cos(i * 0.31) * 0.5f).map(_.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", d, k = d)
    // reference: covariance on the driver from the same rows
    val xs = rows.map(_._2.map(_.toDouble).toArray)
    val n = xs.length.toDouble
    val mean = Array.tabulate(d)(j => xs.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      xs.map(x => x(i) * x(j)).sum / n - mean(i) * mean(j))
    val (refEvals, _) = Pca.jacobiEigen(cov)
    model.mean.zip(mean).foreach { case (a, b) => assertClose(a, b, 1e-6) }
    model.eigenvalues.zip(refEvals).foreach { case (a, b) => assertClose(a, b, 1e-6) }
    assert(model.nRows == 200L)
    // spectrum is descending
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
  }

  test("rank-k data reconstructs exactly: recon_err ~ 0 with k components") {
    // vectors in a 2-plane of R4: x = a*u + b*w
    val u = Array(1.0, 0.0, 1.0, 0.0)
    val w = Array(0.0, 2.0, 0.0, -1.0)
    val rows = (0 until 50).map { i =>
      val a = math.sin(i * 0.9) * 3; val b = math.cos(i * 0.4) * 2
      (i.toLong, (0 until 4).map(j => (a * u(j) + b * w(j)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", d = 4, k = 2)
    val got = Pca.project(df, "vec_id", "embedding", model)
      .collect().map(r => r.getDouble(2))
    assert(got.forall(_ <= 1e-4), s"rank-2 data must reconstruct, max=${got.max}")
    assertClose(model.explainedVariance, 1.0, 1e-9)
  }

  test("Parseval: mean squared recon_err equals the dropped eigenvalue mass") {
    val d = 4
    val rows = (0 until 100).map { i =>
      (i.toLong, (0 until d).map(j =>
        (math.sin(i * 1.1 + j) * (4 - j)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", d, k = 2)
    val errs = Pca.project(df, "vec_id", "embedding", model)
      .collect().map(r => r.getDouble(2))
    val meanSq = errs.map(e => e * e).sum / errs.length
    val dropped = model.eigenvalues.drop(2).sum
    assertClose(meanSq, dropped, 1e-3)
  }

  test("malformed vectors are skipped by fit and filtered by project") {
    val good = (0 until 20).map(i => (i.toLong, Seq(i.toFloat, (i * 2).toFloat)))
    val bad = Seq((90L, null: Seq[Float]), (91L, Seq(1.0f)))
    val df = (good.map { case (id, v) => (id, v) } ++ bad).toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", d = 2, k = 1)
    assert(model.nRows == 20L)
    val ids = Pca.project(df, "vec_id", "embedding", model)
      .select("vec_id").as[Long].collect().toSet
    assert(!ids.contains(90L) && !ids.contains(91L))
    assert(ids.size == 20)
  }
}
