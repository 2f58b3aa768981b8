package graft.functions

/** Seeded, fully deterministic Lloyd's k-means over a DRIVER-SIDE
  * sample — the codebook trainer for the ANN index builds.
  *
  * Why not an MLlib fit: the trained artifacts are model-sized
  * (IVF coarse centroids: NCells × Dim doubles; PQ codebooks:
  * M × K × subDim doubles), and at 100 TB the standard practice —
  * FAISS's own — is to train them on a bounded sample, then run the
  * full-corpus work (cell assignment, code encoding) as one map-side
  * pass with the artifacts broadcast. A distributed fit per subspace
  * buys nothing: each MLlib KMeans run is 10+ tiny jobs (k-means||
  * init passes + iterations), and the PQ build launches M of them
  * SEQUENTIALLY — pure scheduler latency on a sample-sized problem
  * (the round-7 sim_ann_pq/ivfpq drift).
  *
  * Determinism contract (retries / re-runs must reproduce bits):
  * callers pass the sample in a canonical order (sort by id after
  * collect); init is seeded k-means++ via java.util.Random (its
  * algorithm is specified, so draws are JVM-independent); Lloyd
  * assignment breaks ties toward the lower centroid index; means are
  * accumulated in sample order; an emptied cluster keeps its previous
  * centroid. Fixed iteration count, no tolerance-based early exit.
  */
object LocalKMeans {

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  /** Index of the nearest centroid (squared euclidean, ties → lower
    * index). Also the full-corpus assignment kernel — broadcast the
    * fitted centroids and call this per row map-side.
    */
  def nearestIdx(centroids: Array[Array[Double]], p: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val d = sqDist(p, centroids(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Total squared quantization error of `points` under `centroids`. */
  def sse(centroids: Array[Array[Double]], points: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < points.length) {
      s += sqDist(points(i), centroids(nearestIdx(centroids, points(i))))
      i += 1
    }
    s
  }

  /** Best-of-`restarts` fit: `restarts` independent seeded k-means++
    * inits, each refined with `maxIter` Lloyd iterations, keeping the
    * lowest-SSE result (ties → earliest restart, so still fully
    * deterministic). On a driver-side sample the extra restarts are
    * microseconds-to-milliseconds; they buy back the init quality a
    * single k-means++ draw leaves on the table vs MLlib's k-means||
    * (which seeds from many candidates).
    */
  def fitBest(points: Array[Array[Double]], k: Int, maxIter: Int, seed: Long,
      restarts: Int = 4): Array[Array[Double]] = {
    require(restarts >= 1)
    var best: Array[Array[Double]] = null
    var bestSse = Double.MaxValue
    var r = 0
    while (r < restarts) {
      val c = fit(points, k, maxIter, seed + r * 1000003L)
      val e = sse(c, points)
      if (e < bestSse) { bestSse = e; best = c }
      r += 1
    }
    best
  }

  /** k-means++ init + `maxIter` Lloyd iterations. `points` must be in
    * canonical (caller-sorted) order and have length ≥ k.
    */
  def fit(points: Array[Array[Double]], k: Int, maxIter: Int, seed: Long): Array[Array[Double]] = {
    val n = points.length
    require(n >= k, s"k-means needs at least k=$k points, got $n")
    val dim = points(0).length
    val rnd = new java.util.Random(seed)

    // GREEDY k-means++ (the scikit-learn variant): first center
    // uniform; each subsequent center drawn as the best of
    // 2 + ⌊ln k⌋ candidates sampled ∝ D², "best" = largest reduction
    // of the total quantization potential. Single-draw k-means++ left
    // enough init quality on the table to cost PQ recall vs MLlib's
    // k-means|| (which likewise seeds from many candidates).
    val trials = 2 + math.max(0, math.log(k.toDouble).toInt)
    val centers = new Array[Array[Double]](k)
    centers(0) = points(rnd.nextInt(n)).clone()
    val minD2 = new Array[Double](n)
    var i0 = 0
    while (i0 < n) { minD2(i0) = sqDist(points(i0), centers(0)); i0 += 1 }
    var c = 1
    while (c < k) {
      var total = 0.0
      var i = 0
      while (i < n) { total += minD2(i); i += 1 }
      var bestIdx = -1
      var bestPot = Double.MaxValue
      var t = 0
      while (t < trials) {
        var idx = 0
        if (total > 0) {
          val r = rnd.nextDouble() * total
          var acc = minD2(0)
          while (acc <= r && idx < n - 1) { idx += 1; acc += minD2(idx) }
        } else {
          // degenerate sample (all points coincide with chosen centers)
          idx = rnd.nextInt(n)
        }
        val cand = points(idx)
        var pot = 0.0
        i = 0
        while (i < n) { pot += math.min(minD2(i), sqDist(points(i), cand)); i += 1 }
        // `|| bestIdx < 0` guards NaN/∞ coordinates in the sample: a
        // single NaN poisons every potential, every `<` comparison is
        // false, and an unguarded loop would exit with bestIdx == -1
        // (an opaque AIOOBE from inside an index build)
        if (pot < bestPot || bestIdx < 0) { bestPot = pot; bestIdx = idx }
        t += 1
      }
      val chosen = points(bestIdx)
      centers(c) = chosen.clone()
      var j = 0
      while (j < n) {
        val d2 = sqDist(points(j), chosen)
        if (d2 < minD2(j)) minD2(j) = d2
        j += 1
      }
      c += 1
    }

    // Lloyd: assign (ties → lower index), recompute means in sample
    // order, emptied cluster keeps its previous centroid
    val sums = Array.ofDim[Double](k, dim)
    val counts = new Array[Long](k)
    var iter = 0
    while (iter < maxIter) {
      java.util.Arrays.fill(counts, 0L)
      var j = 0
      while (j < k) { java.util.Arrays.fill(sums(j), 0.0); j += 1 }
      var i = 0
      while (i < n) {
        val p = points(i)
        val a = nearestIdx(centers, p)
        counts(a) += 1
        val s = sums(a)
        var dIdx = 0
        while (dIdx < dim) { s(dIdx) += p(dIdx); dIdx += 1 }
        i += 1
      }
      j = 0
      while (j < k) {
        if (counts(j) > 0) {
          val ctr = centers(j)
          var dIdx = 0
          while (dIdx < dim) { ctr(dIdx) = sums(j)(dIdx) / counts(j); dIdx += 1 }
        }
        j += 1
      }
      iter += 1
    }
    centers
  }
}
