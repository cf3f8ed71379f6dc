package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every catalog query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * {"metric":"total","value":sec,"unit":"sec","queries":{...},"sf":...}.
  *
  * A warmup pass (flagship + one catalog query) runs first so per-query
  * numbers measure steady-state plan execution, not JVM/codegen JIT.
  * Queries run in sorted name order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the canonical engine session — benchmarked plans must be the plans
    // the engine ships (extensions/CollapseDedup installed at build
    // time), not a drifted hand-rolled config
    val spark = EngineSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-bench")

    // Warmup: JIT the scan/agg/join/window paths once, untimed. The
    // complex pipelines additionally warm at sf0.001 — whole-stage
    // codegen caches by generated source, so running the same plan shape
    // on toy data compiles the classes the timed run will hit (one-time
    // compiler cost, not steady-state throughput, stays out of timings).
    // per-step try (NonFatal only): one failed warm (e.g. a missing toy
    // SF dir) must not silently skip the REST of the warmup — losing it
    // shifts all the JIT cost into pass 1 and fakes pass disagreement
    import scala.util.control.NonFatal
    def warm(step: => Unit): Unit =
      try step catch { case NonFatal(_) => () }
    warm(SparkEntry.entry(spark).count())
    warm(SparkEntry.queries("o_a1_hashagg")(spark, sfDir).count())
    warm(SparkEntry.queries("o_j1_inner")(spark, sfDir).count())
    val warmSf = "/root/testdata/sf0.001"
    Seq("d_dedup_minhash", "d_dedup_simhash", "d_dedup_ngram",
        "d_dedup_cosine", "d_knn_cosine", "d_ann_lsh", "d_ann_ivf",
        "o_j6b_asof_native", "o_j6c_asof_forward", "o_a12_sketch_merge",
        "d_dedup_cluster", "d_emb_outlier", "d_decontam",
        "d_dedup_keep_best", "d_curation_apply", "d_pipeline_e2e",
        "d_backbone_incr", "d_token_budget",
        "d_span_scrub", "d_decontam_bloom", "d_pipeline_scrubbed",
        "d_pipeline_sharded", "d_semantic_delta_stored", "d_semantic_incr",
        "d_shard_delta", "d_semantic_drift", "d_curation_drift")
      .foreach(q => warm(SparkEntry.queries(q)(spark, warmSf).count()))

    // The dedup cascade reads the STORED backbone tables (fingerprints,
    // banded signatures, verified pairs, cluster labels — pipeline
    // .Backbone). Build them up front and report the one-time cost as its
    // own line item, so every per-query timing below uniformly measures
    // the shared-backbone regime (the production shape: one backbone
    // evaluation per curation run, N readers).
    val tBackbone0 = System.nanoTime()
    val backboneSec =
      try {
        pipeline.Backbone.prebuild(spark, sfDir)
        (System.nanoTime() - tBackbone0) / 1e9
      } catch { case NonFatal(_) => -1.0 }
    // embedding-side index build timed SEPARATELY: a vec failure must
    // not discard the text timing, and a -1 here tells the reader the
    // first d_ann_*/d_semantic_* timing below paid the index build
    val tVec0 = System.nanoTime()
    val vecIndexSec =
      try {
        pipeline.VecBackbone.prebuild(spark, sfDir)
        (System.nanoTime() - tVec0) / 1e9
      } catch { case NonFatal(_) => -1.0 }
    // curated-pipeline artifact (decision + scrubbed-text tables) — its
    // own line item like the two index builds above
    val tPipe0 = System.nanoTime()
    val pipelineSec =
      try {
        pipeline.EndToEnd.prebuild(spark, sfDir)
        (System.nanoTime() - tPipe0) / 1e9
      } catch { case NonFatal(_) => -1.0 }

    // A failed query must not masquerade as a fast one: its timing is
    // reported as -1 and its name lands in "errors". NonFatal only: an
    // OOM'd or interrupted JVM must abort the bench, not keep publishing
    // timings measured inside a corrupted heap.
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case NonFatal(_) => false }
      (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
    }
    // This box shares hardware with noisy co-tenants: a single timing can
    // be 10-30x off (observed: a 0.5s query reported at 86s during a
    // storm). Defense: run the whole catalog in FULL PASSES and keep the
    // per-query minimum — min-of-passes converges on steady-state cost as
    // long as any pass hits a quiet window, which whole-catalog spacing
    // (~30s apart) makes far more likely than an immediate re-run. Pass 3
    // runs only when passes 1-2 disagree (>20% on totals), so a quiet
    // machine pays ~2x bench wall and a stormy one gets a third sample.
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
    // contention marker: 1-minute system load average sampled at the
    // start of each pass — a per-key audit can mechanically discount a
    // pass that ran inside a co-tenant storm (load >> 32) instead of
    // inferring it from timing spreads
    val passLoads = scala.collection.mutable.Buffer[Double]()
    def fullPass(): Seq[(String, Double, Boolean)] = {
      passLoads += java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      catalog.map { case (name, fn) => val (t, ok) = run(name, fn); (name, t, ok) }
    }
    def passTotal(p: Seq[(String, Double, Boolean)]): Double =
      p.collect { case (_, t, true) => t }.sum
    def merge(a: Seq[(String, Double, Boolean)], b: Seq[(String, Double, Boolean)])
        : Seq[(String, Double, Boolean)] =
      a.zip(b).map { case ((n, t1, ok1), (_, t2, ok2)) =>
        if (ok1 && ok2) (n, math.min(t1, t2), true)
        else if (ok1) (n, t1, true) else (n, t2, ok2)
      }
    val p1 = fullPass()
    val p2 = fullPass()
    val best2 = merge(p1, p2)
    val stable =
      math.abs(passTotal(p1) - passTotal(p2)) <=
        0.2 * math.max(passTotal(p1), passTotal(p2))
    val passes: Seq[Seq[(String, Double, Boolean)]] =
      if (stable) Seq(p1, p2) else { val p3 = fullPass(); Seq(p1, p2, p3) }
    val merged = passes.reduce(merge)
    // Residual outliers (well above the catalog median even after the
    // min-merge) get one more isolated re-run, min kept.
    val okTimes = merged.collect { case (_, t, true) => t }.sorted
    val median = if (okTimes.isEmpty) 0.0 else okTimes(okTimes.length / 2)
    val threshold = math.max(2.0, 5 * median)
    val results = merged.map { case (name, t, ok) =>
      if (ok && t > threshold) {
        val (t2, ok2) = run(name, SparkEntry.queries(name))
        (name, if (ok2) math.min(t, t2) else t, true)
      } else (name, t, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // per-pass totals make the min-of-passes policy auditable: a noisy
    // co-tenant window shows up as pass disagreement, not as a silently
    // inflated per-query number (r7's o_w9_ema lesson)
    val passTotals = passes.map(p => f"${passTotal(p)}%.3f").mkString("[", ",", "]")
    val passLoadsJson = passLoads.take(passes.length)
      .map(l => f"$l%.2f").mkString("[", ",", "]")
    // sfDir is environment-controlled: escape it so a quote/backslash in
    // the path cannot break the one-line JSON contract
    val sfJson = "\"" + sfDir.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    // whale-headroom gauge: the peak buffered events any parametric
    // aggregate held for one group across the whole run, vs the cap —
    // the pre-failure observability VERDICT r16 asked for
    val maxGroupEvents = functions.ParametricAgg.peakBuffered
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","timing":"min-of-${passes.length}-passes","pass_totals":$passTotals,"pass_load_avg":$passLoadsJson,${BootInfo.jsonFields},"backbone_build_sec":$backboneSec,"vec_index_build_sec":$vecIndexSec,"pipeline_build_sec":$pipelineSec,"max_group_events":$maxGroupEvents,"parametric_cap":${functions.ParametricAgg.maxEvents},"queries":$qs,"errors":$errors,"sf":$sfJson}"""
    println(line)
    // The driver captures stdout with a tail that can truncate the JSON
    // head on long runs — persist the full line to a file as well so
    // totals survive for tools/bench_compare.py.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")),
      line + "\n")
    catch { case NonFatal(e) => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
