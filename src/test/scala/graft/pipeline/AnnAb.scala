package graft.pipeline

/** Warm per-query A/B diagnostic: times each named catalog query over 3
  * passes, splitting PLAN BUILD (catalog fn call: memo lookups, expr
  * parsing/analysis) from EXECUTION (count job). Born for the
  * d_ann_ivf/d_ann_ivfpq regression adjudication (VERDICT r11 #2 —
  * BENCH_NOTES round-12 entry); reusable for any before/after measure.
  * Run: sbt "Test/runMain graft.pipeline.AnnAb [query ...]"
  * (SPARK_GRAFT_SF_DIR overrides the sf0.1 default).
  */
object AnnAb {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_GATE pins the OrderStats adaptive gate (bytes; 0 =
    // always distributed) for before/after gate measurements
    sys.env.get("SPARK_GRAFT_GATE")
      .foreach(v => sys.props("graft.orderstats.gateBytes") = v)
    val qs = if (args.nonEmpty) args.toSeq else Seq("d_ann_ivf", "d_ann_ivfpq")
    val spark = graft.EngineSession.local(32, "ann-ab")
    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm exactly like Bench: same plan shapes at the toy SF (a warm
    // failure is PRINTED, not swallowed — silently-cold pass-1 numbers
    // would skew exactly the adjudications this tool exists for)
    val warmSf = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    qs.foreach { q =>
      scala.util.Try(graft.SparkEntry.queries(q)(spark, warmSf).count())
        .failed.foreach(e =>
          println(s"[ann-ab] WARM FAILED for $q at $warmSf: $e — pass 1 is cold"))
    }

    if (qs.exists(_.startsWith("d_ann"))) {
      // ANN memo components, cold then warm
      val (ck, ckSec) = t(Similarity.corpusKey(spark, sf))
      val e0 = graft.Tables.embeddings(spark, sf)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"))
      val (_, sampCold) = t(Similarity.sampleCached(ck, e0))
      val (_, sampWarm) = t(Similarity.sampleCached(ck, e0))
      println(f"[ann-ab] corpusKey=$ckSec%.3f sampleCold=$sampCold%.3f " +
        f"sampleWarm=$sampWarm%.3f")
    }

    for (q <- qs; pass <- 1 to 3) {
      val (df, buildSec) = t(graft.SparkEntry.queries(q)(spark, sf))
      val (_, execSec) = t(df.count())
      println(f"[ann-ab] $q pass$pass build=$buildSec%.3f exec=$execSec%.3f " +
        f"total=${buildSec + execSec}%.3f")
    }
    spark.stop()
  }
}
