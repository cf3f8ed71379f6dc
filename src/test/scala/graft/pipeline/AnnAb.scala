package graft.pipeline

/** Diagnostic A/B for the d_ann_ivf / d_ann_ivfpq bench regression
  * (VERDICT r11 #2): times each query over 3 warm passes at sf0.1,
  * splitting PLAN BUILD (catalog fn call: corpusKey listing, memoized
  * sample+fit, expr parsing/analysis of the literal-centroid SQL) from
  * EXECUTION (count job), plus the memo components individually.
  * Run: sbt "Test/runMain graft.pipeline.AnnAb [sfDir]".
  */
object AnnAb {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.EngineSession.local(32, "ann-ab")
    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm exactly like Bench: same plan shapes at sf0.001
    Seq("d_ann_ivf", "d_ann_ivfpq").foreach(q =>
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count())

    // memo components, cold then warm
    val (ck, ckSec) = t(Similarity.corpusKey(spark, sf))
    val e0 = graft.Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val (_, sampCold) = t(Similarity.sampleCached(ck, e0))
    val (_, sampWarm) = t(Similarity.sampleCached(ck, e0))
    println(f"[ann-ab] corpusKey=$ckSec%.3f sampleCold=$sampCold%.3f " +
      f"sampleWarm=$sampWarm%.3f")

    for (q <- Seq("d_ann_ivf", "d_ann_ivfpq"); pass <- 1 to 3) {
      val (df, buildSec) = t(graft.SparkEntry.queries(q)(spark, sf))
      val (_, execSec) = t(df.count())
      println(f"[ann-ab] $q pass$pass build=$buildSec%.3f exec=$execSec%.3f " +
        f"total=${buildSec + execSec}%.3f")
    }
    spark.stop()
  }
}
