package graft.functions

import graft.TestSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class TopKSketchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def u(s: String) = UTF8String.fromString(s)

  /** Zipf-ish stream: item i appears ~N/i times — heavy head, long tail. */
  private def zipf(nItems: Int, scale: Int): Seq[String] =
    (1 to nItems).flatMap(i => Seq.fill(scale / i)(s"item$i"))

  test("exact below capacity: counts precise, err 0, merge lossless") {
    val xs = zipf(20, 1000)
    val st = new TopKSketch.State(64)
    xs.foreach(x => st.insert(u(x)))
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    TopKSketch.sortedEntries(st).foreach { case (v, est, err) =>
      assert(est == truth(v.toString) && err == 0L)
    }
    // split+merge in two different batchings == single pass, byte-equal
    def build(chunks: Seq[Seq[String]]): Array[Byte] = {
      val acc = new TopKSketch.State(0)
      chunks.foreach { c =>
        val p = new TopKSketch.State(64); c.foreach(x => p.insert(u(x)))
        acc.mergeFrom(p)
      }
      TopKSketch.serialize(acc)
    }
    assert(build(xs.grouped(137).toSeq).sameElements(build(xs.reverse.grouped(41).toSeq)))
  }

  test("over capacity: SpaceSaving guarantees hold, heavy head survives") {
    // interleave deterministically: contiguous per-item runs are the
    // adversarial order for SpaceSaving (min-est ratchets past mid
    // items); real event streams arrive mixed.
    val xs = new scala.util.Random(42).shuffle(zipf(500, 5000)) // 500 distinct >> cap 48
    val st = new TopKSketch.State(48)
    xs.foreach(x => st.insert(u(x)))
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(st.counts.size == 48)
    TopKSketch.sortedEntries(st).foreach { case (v, est, err) =>
      val t = truth(v.toString)
      assert(t <= est && est - err <= t, s"$v: true=$t est=$est err=$err")
    }
    // untracked items are bounded by the min tracked estimate
    val tracked = TopKSketch.sortedEntries(st).map(_._1.toString).toSet
    val minEst = TopKSketch.sortedEntries(st).map(_._2).min
    truth.filterNot { case (k, _) => tracked(k) }
      .foreach { case (k, t) => assert(t <= minEst, s"untracked $k: $t > $minEst") }
    // the true top heavy hitters survive in an interleaved stream
    val top5 = truth.toSeq.sortBy(-_._2).take(5).map(_._1)
    top5.foreach(k => assert(tracked(k), s"heavy hitter $k evicted"))
  }

  test("merge over capacity keeps est-err <= true <= est") {
    val xs = zipf(300, 4000)
    val chunks = xs.grouped(977).toSeq
    val acc = new TopKSketch.State(0)
    chunks.foreach { c =>
      val p = new TopKSketch.State(32); c.foreach(x => p.insert(u(x)))
      acc.mergeFrom(p)
    }
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    TopKSketch.sortedEntries(acc).foreach { case (v, est, err) =>
      val t = truth(v.toString)
      assert(t <= est && est - err <= t, s"$v: true=$t est=$est err=$err")
    }
  }

  test("weighted: exact below capacity; guarantees hold over capacity") {
    // weight stream: item i gets total weight ~ 1000*sqrt(i) spread over
    // bursts — exercises both the tracked-gain and evict-inherit paths
    val rnd = new scala.util.Random(7)
    val xs: Seq[(String, Long)] = rnd.shuffle(
      (1 to 200).flatMap(i => Seq.fill(10)((s"w$i", (100 * math.sqrt(i)).toLong))))
    val truth = xs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

    val exact = new TopKSketch.State(256) // 200 distinct < 256
    xs.foreach { case (x, w) => exact.insertW(u(x), w) }
    TopKSketch.sortedEntries(exact).foreach { case (v, est, err) =>
      assert(est == truth(v.toString) && err == 0L)
    }

    val approx = new TopKSketch.State(32)
    xs.foreach { case (x, w) => approx.insertW(u(x), w) }
    TopKSketch.sortedEntries(approx).foreach { case (v, est, err) =>
      val t = truth(v.toString)
      assert(t <= est && est - err <= t, s"$v: true=$t est=$est err=$err")
    }
    // non-positive weights are ignored (CH topKWeighted contract)
    val before = TopKSketch.serialize(approx)
    approx.insertW(u("w1"), 0L); approx.insertW(u("zzz"), -5L)
    assert(TopKSketch.serialize(approx).sameElements(before))
  }

  test("weighted SQL surface: exact regime formats by weight desc") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq(("a", 5L), ("b", 7L), ("a", 1L), ("c", 2L)).toDF("x", "w")
      .createOrReplaceTempView("tkw_in")
    val out = spark.sql(
      "SELECT topk_extract(topk_weighted_agg(x, w, 16), 2) AS t FROM tkw_in")
      .head().getString(0)
    assert(out == "b:7|a:6")
  }

  test("SQL surface: extract formats top-k with deterministic tie-break") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq("b", "a", "a", "c", "b", "d").toDF("x").createOrReplaceTempView("tk_in")
    val out = spark.sql(
      "SELECT topk_extract(topk_agg(x, 16), 3) AS t FROM tk_in").head().getString(0)
    assert(out == "a:2|b:2|c:1") // a before b on the est tie; d cut by k=3
  }
}
