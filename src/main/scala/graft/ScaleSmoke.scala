package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress main for the iterative/quadratic-prone operators: builds a
  * synthetic embedding corpus K× the sf0.1 fixture (seeded, clustered so
  * near-dup structure exists at every scale) and times the semantic-dedup
  * and ANN paths on it.
  *
  * Purpose: the small-SF catalog proves CORRECTNESS; this proves the SHAPE
  * — that candidate generation stays bucket-local, that component rounds
  * grow with log(diameter) not corpus size, and that wall-clock grows
  * ~linearly in rows. Run: `tools/scale_smoke.sh [multipliers...]`.
  *
  * The corpus is a mixture over FIXED-SIZE clusters (~50 points, the
  * bounded dup-group shape of real corpora — cluster COUNT grows with n,
  * not cluster size): each cluster has a seeded ±1.5 sign pattern on the
  * first 16 dims, so its points agree on every sign-LSH plane (the noise
  * never flips a ±1.5 signal) and form a same-bucket clique of mutual
  * near-dups (same-cluster cosine ≈ 0.93, cross-cluster ≈ 0), while
  * cluster patterns spread uniformly over buckets. The component loop
  * therefore runs on real cliques, and pair cost stays Σ|bucket|² with
  * buckets sized by the plane count.
  */
object ScaleSmoke {

  def synth(spark: SparkSession, n: Int, dims: Int, out: String): Unit = {
    val clusters = math.max(4, n / 50)
    val df = spark.range(n.toLong).select(col("id").as("vec_id"),
        (col("id") % clusters).as("c"))
      .withColumn("embedding", expr(
        // per-cluster ±1.5 sign pattern (seeded by hash(c, i)) on the
        // first 16 dims + per-point noise ±0.4 everywhere: the signal
        // dominates, so the sign bits — and the LSH bucket — are a
        // cluster property
        s"""transform(sequence(0, ${dims - 1}), i ->
              CAST(IF(i < 16, IF(pmod(hash(c, i), 2) = 0, 1.5, -1.5), 0.0)
                   + (pmod(hash(vec_id, i), 1000) / 1000.0 - 0.5) * 0.8
                AS FLOAT))"""))
      .select("vec_id", "embedding")
    df.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  def timeIt(label: String, f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[scale] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = EngineSession.local(appName = "graft-scale-smoke")
    val base = 2000 // sf0.1 embeddings fixture size
    mults.foreach { m =>
      val n = base * m
      val dir = s"${sys.props("java.io.tmpdir")}/graft_scale_$m"
      synth(spark, n, 64, dir)
      // the d_ann_lsh sizing rule: 2^planes ≈ n/30 (floored at 4 planes,
      // which binds only below n=480 — every reachable scale sizes up);
      // SPARK_GRAFT_SMOKE_PLANES pins a fixed count to measure what
      // UNDER-sized buckets cost
      val planes = sys.env.get("SPARK_GRAFT_SMOKE_PLANES").map(_.toInt)
        .getOrElse(math.max(4, math.min(16,
          (math.log(n / 30.0) / math.log(2)).round.toInt)))
      timeIt(s"semanticDedup x$m (n=$n, planes=$planes)",
        pipeline.Similarity.semanticDedup(spark,
          Tables.embeddings(spark, dir), planes, 0.3).count())
      timeIt(s"d_ann_lsh     x$m (n=$n)",
        SparkEntry.queries("d_ann_lsh")(spark, dir).count())
    }
    spark.stop()
  }
}
