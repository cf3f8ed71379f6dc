package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class MiniKMeansSpec extends AnyFunSuite {

  private def near(a: Array[Double], b: Array[Double], eps: Double): Boolean =
    a.zip(b).forall { case (x, y) => math.abs(x - y) < eps }

  test("separates two obvious clusters; deterministic across calls") {
    // 40 points around (0,0), 40 around (10,10)
    val pts = (0 until 40).map(i => Array(i % 5 * 0.01, i % 7 * 0.01)) ++
      (0 until 40).map(i => Array(10 + i % 5 * 0.01, 10 + i % 7 * 0.01))
    val c1 = MiniKMeans.fit(pts.toArray, k = 2, iters = 10, seed = 7)
    val c2 = MiniKMeans.fit(pts.toArray, k = 2, iters = 10, seed = 7)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "same seed, same centers")
    val sorted = c1.sortBy(_.sum)
    assert(near(sorted(0), Array(0.02, 0.03), 0.5), sorted(0).mkString(","))
    assert(near(sorted(1), Array(10.02, 10.03), 0.5), sorted(1).mkString(","))
    // different seed still lands on the same two cluster means
    val c3 = MiniKMeans.fit(pts.toArray, k = 2, iters = 10, seed = 99).sortBy(_.sum)
    assert(near(c3(0), sorted(0), 0.1) && near(c3(1), sorted(1), 0.1))
  }

  test("k exceeding distinct points duplicates centers harmlessly") {
    val pts = Array(Array(1.0), Array(1.0), Array(2.0))
    val cs = MiniKMeans.fit(pts, k = 5, iters = 5, seed = 1)
    assert(cs.length == 5)
    // every center sits on one of the two distinct values
    assert(cs.forall(c => math.abs(c(0) - 1.0) < 1e-9 || math.abs(c(0) - 2.0) < 1e-9))
  }

  test("empty-cluster rounds keep previous centers (no NaN)") {
    val pts = Array.tabulate(10)(i => Array(i.toDouble))
    val cs = MiniKMeans.fit(pts, k = 4, iters = 20, seed = 3)
    assert(cs.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
  }
}
