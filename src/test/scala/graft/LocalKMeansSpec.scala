package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LocalKMeans

class LocalKMeansSpec extends AnyFunSuite {

  private def grid(n: Int): Array[Array[Double]] =
    Array.tabulate(n)(i => Array((i % 10).toDouble, (i / 10).toDouble))

  test("fit is deterministic per seed and distinct across seeds") {
    val pts = grid(200)
    val a = LocalKMeans.fit(pts, 8, 10, 42L)
    val b = LocalKMeans.fit(pts, 8, 10, 42L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val c = LocalKMeans.fit(pts, 8, 10, 43L)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq,
      "different seeds should explore different inits on this grid")
  }

  test("fitBest never returns a worse-SSE result than a single fit") {
    val pts = grid(300)
    val single = LocalKMeans.sse(LocalKMeans.fit(pts, 8, 10, 42L), pts)
    val best = LocalKMeans.sse(LocalKMeans.fitBest(pts, 8, 10, 42L, 4), pts)
    assert(best <= single + 1e-12)
  }

  test("NaN coordinates in the sample do not crash the greedy init") {
    // a single NaN poisons every candidate potential; the init must
    // still terminate (guarded bestIdx) instead of AIOOBE(-1)
    val pts = grid(50)
    pts(7) = Array(Double.NaN, 1.0)
    val centers = LocalKMeans.fit(pts, 4, 5, 42L)
    assert(centers.length == 4)
    assert(centers.forall(_.length == 2))
  }

  test("nearestIdx breaks ties toward the lower centroid index") {
    val cs = Array(Array(0.0, 0.0), Array(2.0, 0.0))
    assert(LocalKMeans.nearestIdx(cs, Array(1.0, 0.0)) == 0)
  }

  test("k > n is refused loudly") {
    intercept[IllegalArgumentException](LocalKMeans.fit(grid(3), 4, 5, 1L))
  }
}
