package graft.pipeline

/** Driver-side Lloyd's k-means over a BOUNDED sample.
  *
  * The ANN quantizers (IVF cells, PQ codebooks — cf. reference embedding
  * workloads) train on a capped sample because centroid quality saturates
  * long before corpus size; only the ASSIGNMENT pass must be distributed.
  * Fitting the sample with Spark ML means m+1 iterative multi-job fits —
  * per-iteration job scheduling dominates when the sample is 2k rows. A
  * plain in-memory Lloyd's loop on the collected sample costs
  * O(iters·n·k·dim) flops (~20M here, microseconds-to-milliseconds) and
  * zero Spark jobs; the corpus never reaches the driver.
  *
  * Deterministic: seeded k-means++ init, ties broken by lowest index,
  * fixed iteration count with early exit on unchanged assignment.
  */
object MiniKMeans {

  /** Squared Euclidean distance. */
  private def sq(a: Array[Double], b: Array[Double]): Double = {
    var i = 0; var s = 0.0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Fit `k` centers on `points` (each row one vector). Returns exactly
    * `k` centers; if the sample has fewer than `k` distinct points, the
    * surplus centers duplicate existing ones (harmless: argmin ties break
    * by index, so duplicated centers own no points). */
  def fit(points: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means on an empty sample")
    val n = points.length
    val rng = new scala.util.Random(seed)

    // k-means++ init: first center uniform, then D² sampling.
    val centers = new Array[Array[Double]](k)
    centers(0) = points(rng.nextInt(n)).clone()
    val d2 = Array.tabulate(n)(i => sq(points(i), centers(0)))
    var c = 1
    while (c < k) {
      val total = d2.sum
      if (total <= 0) {
        // all remaining points coincide with a chosen center
        centers(c) = centers(c - 1).clone()
      } else {
        var r = rng.nextDouble() * total
        var pick = 0
        while (pick < n - 1 && r > d2(pick)) { r -= d2(pick); pick += 1 }
        centers(c) = points(pick).clone()
      }
      var i = 0
      while (i < n) { val d = sq(points(i), centers(c)); if (d < d2(i)) d2(i) = d; i += 1 }
      c += 1
    }

    // Lloyd's iterations.
    val assign = new Array[Int](n)
    java.util.Arrays.fill(assign, -1)
    val dim = points(0).length
    var it = 0
    var changed = true
    while (it < iters && changed) {
      changed = false
      var i = 0
      while (i < n) {
        var best = 0; var bestD = sq(points(i), centers(0))
        var j = 1
        while (j < k) {
          val d = sq(points(i), centers(j))
          if (d < bestD) { best = j; bestD = d }
          j += 1
        }
        if (best != assign(i)) { assign(i) = best; changed = true }
        i += 1
      }
      if (changed) {
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Int](k)
        i = 0
        while (i < n) {
          val a = assign(i); counts(a) += 1
          val p = points(i); val s = sums(a)
          var j = 0
          while (j < dim) { s(j) += p(j); j += 1 }
          i += 1
        }
        var j = 0
        while (j < k) {
          // empty cluster keeps its previous center (stable, deterministic)
          if (counts(j) > 0) {
            val s = sums(j)
            var t = 0
            while (t < dim) { s(t) /= counts(j); t += 1 }
            centers(j) = s
          }
          j += 1
        }
      }
      it += 1
    }
    centers
  }
}
