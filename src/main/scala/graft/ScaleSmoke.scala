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
  * The corpus is a mixture over C cluster centers with per-point noise —
  * each center's points are mutual near-dups at the 0.3 cosine threshold,
  * so the threshold graph has giant-ish components (the adversarial case
  * for label propagation) while cross-center pairs stay below threshold.
  */
object ScaleSmoke {

  def synth(spark: SparkSession, n: Int, dims: Int, centers: Int,
            out: String): Unit = {
    val df = spark.range(n.toLong).select(col("id").as("vec_id"),
        (col("id") % centers).as("c"))
      .withColumn("embedding", expr(
        // seeded per (vec_id, dim) noise around a per-center axis bump:
        // center c points straight at dim (c mod dims) plus small noise —
        // same-center cosine ~0.9, cross-center ~0.1
        s"""transform(sequence(0, ${dims - 1}), i ->
              CAST(IF(i = c % $dims, 3.0, 0.0)
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
      synth(spark, n, 64, 40, dir)
      // the d_ann_lsh sizing rule: 2^planes ≈ n/30, clamped to the
      // catalog's oracle-reproducible 4 at the fixture scale
      val planes = math.max(4, math.min(16,
        (math.log(n / 30.0) / math.log(2)).round.toInt))
      timeIt(s"semanticDedup x$m (n=$n, planes=$planes)",
        pipeline.Similarity.semanticDedup(spark,
          Tables.embeddings(spark, dir), planes, 0.3).count())
      timeIt(s"d_ann_lsh     x$m (n=$n)",
        SparkEntry.queries("d_ann_lsh")(spark, dir).count())
    }
    spark.stop()
  }
}
