package graft.pipeline

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-advance contract (`Backbone.advance`): maintaining the
  * stored backbone with a new batch must (a) reproduce the full-rebuild
  * cluster labels bit-for-bit and (b) never re-scan history text — the
  * two properties that make nightly maintenance O(|batch|) instead of
  * O(|corpus|) at 100 TB.
  */
class BackboneAdvanceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("advanced labels equal the full rebuild bit-for-bit") {
    val full = Backbone.labels(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val incr = Backbone.advance(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.nonEmpty, "fixture regression: full rebuild found no clusters")
    assert(incr == full,
      s"incremental advance diverged from full rebuild:\n" +
        s"  only-incr: ${(incr -- full).toSeq.sorted.take(10)}\n" +
        s"  only-full: ${(full -- incr).toSeq.sorted.take(10)}")
  }

  test("stored history pairs + new-edge union equal the full pair table") {
    val split = TextDedup.deltaSplit(spark, sf)
    val h = Backbone.history(spark, sf, split)
    val histPairs = h.pairs
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullPairs = Backbone.pairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every stored history pair is a full pair, and every full pair
    // missing from history has at least one batch-side endpoint — i.e. a
    // history×history candidate can never newly arise during advance
    assert(histPairs.subsetOf(fullPairs))
    val newOnes = fullPairs -- histPairs
    assert(newOnes.forall { case (a, b) => a >= split || b >= split },
      s"pair with both endpoints in history absent from stored table: " +
        s"${newOnes.filter { case (a, b) => a < split && b < split }.take(5)}")
  }

  test("advance scans documents only for the batch (filter pushed)") {
    val (advanced, caches) = Backbone.advancePlan(spark, sf)
    try {
      val p = advanced.queryExecution.executedPlan.toString
      val docScans = p.linesIterator
        .filter(l => l.contains("documents.parquet")).toSeq
      assert(docScans.nonEmpty, s"expected a documents scan in:\n$p")
      val split = TextDedup.deltaSplit(spark, sf)
      assert(docScans.forall(_.contains(s"GreaterThanOrEqual(doc_id,$split)")),
        s"documents scan without the batch filter pushed:\n" +
          docScans.mkString("\n"))
    } finally caches.foreach(_.unpersist())
  }
}
