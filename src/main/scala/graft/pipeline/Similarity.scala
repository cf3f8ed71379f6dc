package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float] column).
  *
  * - `d_knn_cosine`: brute-force cosine top-k — the exactness baseline.
  *   The (small) query set is broadcast; the candidate side streams, so
  *   at 100 TB this is one scan, no shuffle of the big side. Dot products
  *   run through codegen'd higher-order functions (zip_with/aggregate),
  *   not UDFs.
  * - `d_ann_lsh` (rows-only): sign-bit LSH bucketing — the sub-linear
  *   scale path: bucket once (linear), then search only within buckets.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** Exact sequential dot product in double via the native allocation-free
    * [[graft.functions.FloatDot]] expression — same accumulation order as
    * the composable `aggregate(zip_with(...))` fold it replaced (the
    * DuckDB oracles hash-match either way), minus the per-pair
    * intermediate array. Queries call [[register]] before using these. */
  private def register(s: SparkSession): Unit =
    graft.functions.GraftExtensions.register(s)

  private def dot(a: String, b: String) = expr(s"float_dot($a, $b)")

  private def norm(a: String) = expr(s"sqrt(float_dot($a, $a))")

  val queries: Map[String, Q] = Map(
    // Brute-force cosine top-5 neighbors for query vectors vec_id < 10.
    "d_knn_cosine" -> ((s, d) => {
      register(s)
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        .withColumn("qn", norm("qv"))
      val cand = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
        .withColumn("nn", norm("nv"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
      cand.crossJoin(broadcast(q))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("cos", round(dot("qv", "nv") / (col("qn") * col("nn")), 4))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("n_id"), col("cos"))
        .orderBy("q_id", "rnk")
    }),

    // Sign-bit LSH ANN: 4-bit bucket from the signs of the first 4 dims
    // (bucket count tuned to corpus size: 2^b ≈ n/30); exact cosine
    // re-rank within the query's bucket only. No oracle (bucketing choice
    // is engine-internal); SimilaritySpec checks bucket-restricted
    // agreement with brute force.
    "d_ann_lsh" -> ((s, d) => {
      register(s)
      val e = Tables.embeddings(s, d).withColumn("bucket", expr(
        """aggregate(zip_with(slice(embedding, 1, 4), sequence(0, 3),
                              (x, i) -> IF(x >= 0F, shiftleft(1, i), 0)),
                     0, (acc, v) -> acc + v)"""))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
          col("bucket").as("qb"))
        .withColumn("qn", norm("qv"))
      val cand = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"),
        col("bucket"))
        .withColumn("nn", norm("nv"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
      cand.join(broadcast(q), col("bucket") === col("qb"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("cos", round(dot("qv", "nv") / (col("qn") * col("nn")), 4))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("n_id"), col("cos"), col("bucket"))
        .orderBy("q_id", "rnk")
    }),

    // IVF (inverted-file) ANN: k-means coarse quantizer → search only the
    // n_probe closest cells. The centroid table is tiny and broadcast;
    // the big side is scanned once to assign cells (linear), then probed
    // per query — the standard sub-linear ANN layout at corpus scale.
    // Rows-only (clustering is engine-internal); SimilaritySpec measures
    // recall against brute force.
    "d_ann_ivf" -> ((s, d) => {
      register(s)
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val nCells = 8; val nProbe = 2
      val e = Tables.embeddings(s, d)
        .withColumn("features", array_to_vector(col("embedding").cast("array<double>")))
        .persist()
      // Coarse quantizer fits on a bounded sample (standard IVF practice:
      // centroid quality saturates long before corpus size, and the fit is
      // the only iterative multi-job stage). Assignment below still scans
      // the full corpus once.
      val n = e.count()
      val sampleCap = 2000L
      val trainSet =
        if (n <= sampleCap) e.select("features")
        else e.select("features").sample(withReplacement = false,
          sampleCap.toDouble / n, seed = 42)
      val model = new KMeans().setK(nCells).setSeed(42).setMaxIter(10)
        .fit(trainSet)
      val assigned = model.transform(e).withColumnRenamed("prediction", "cell")
      // n_probe nearest cells per query vector, by distance to centroids
      val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray)
      }.toSeq
      val cDf = s.createDataFrame(centroids).toDF("cell", "centroid")
      val q = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        .withColumn("qn", norm("qv"))
      val qCells = q.crossJoin(broadcast(cDf))
        .withColumn("dist", expr(
          """aggregate(zip_with(qv, centroid, (x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)),
                       0D, (acc, v) -> acc + v)"""))
        .withColumn("rk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("dist"), col("cell"))))
        .filter(col("rk") <= nProbe)
        .select(col("q_id"), col("qv"), col("qn"), col("cell"))
      val cand = assigned.select(col("vec_id").as("n_id"), col("embedding").as("nv"),
        col("cell")).withColumn("nn", norm("nv"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
      Materialize.drop(cand.join(broadcast(qCells), Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("cos", round(dot("qv", "nv") / (col("qn") * col("nn")), 4))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("n_id"), col("cos"))
        .orderBy("q_id", "rnk"), e)
    }),

    // IVF-PQ ANN: the 100 TB embedding-search layout — coarse IVF cells
    // plus PRODUCT QUANTIZATION of the residual storage: each vector is
    // encoded as m codebook ids (m bytes vs D floats, a 64x compression
    // here), candidates are scored by ADC table lookups (no float math
    // per pair), and only the rerank-top survivors pay an exact cosine.
    // Rows-only (quantization is engine-internal); SimilaritySpec
    // measures recall@5 against brute force.
    "d_ann_ivfpq" -> ((s, d) =>
      ivfPq(s, Tables.embeddings(s, d), nCells = 8, nProbe = 2,
        m = 4, k = 16, rerank = 50, topK = 5)),

    // Semantic dedup END-TO-END: sign-LSH bucketing (the d_ann_lsh planes)
    // → exact cosine edges within bucket → connected components → one
    // cluster label per vector. This is embedding-space near-dup removal
    // at corpus scale: candidate generation is a bucket-keyed equi-join
    // (never all-pairs), components run on vertex-keyed shuffles bounded
    // by cluster diameter ([[Graph.minLabelComponents]]). The axis-sign
    // planes are deterministic, so the WHOLE pipeline — including the
    // bucketing — reproduces in the DuckDB oracle's recursive CTE; a
    // production corpus would raise the plane count with seeded random
    // hyperplanes (2^b ≈ n/30) at the cost of the oracle, trading recall
    // across buckets exactly like d_ann_lsh documents.
    "d_dedup_semantic" -> ((s, d) =>
      semanticDedup(s, Tables.embeddings(s, d), planes = 4, threshold = 0.3)),

    // Embedding-cosine near-duplicate pairs (the "semantic dedup" shape):
    // all pairs above a cosine threshold, via the same broadcast pattern
    // over a bounded probe slice.
    "d_dedup_cosine" -> ((s, d) => {
      register(s)
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("n", norm("v"))
      val a = e.select(col("vec_id").as("va"), col("v").as("xa"), col("n").as("na"))
        .filter(col("va") < 200)
      val b = e.select(col("vec_id").as("vb"), col("v").as("xb"), col("n").as("nb"))
      b.crossJoin(broadcast(a))
        .filter(col("va") < col("vb"))
        .withColumn("cos", round(dot("xa", "xb") / (col("na") * col("nb")), 4))
        .filter(col("cos") >= 0.3)
        .select(col("va"), col("vb"), col("cos"))
        .orderBy("va", "vb")
    })
  )

  /** Semantic dedup library form behind `d_dedup_semantic`: sign-LSH
    * bucketing over the first `planes` dims → exact cosine edges within
    * bucket → [[Graph.minLabelComponents]]. `planes` is THE scale knob:
    * candidate pairs cost Σ|bucket|², so size 2^planes ≈ corpus/30 (the
    * d_ann_lsh rule) to keep buckets bounded as the corpus grows — the
    * catalog instance pins planes=4 because the axis-aligned buckets
    * reproduce exactly in the DuckDB oracle; tools/scale_smoke.sh drives
    * this entry point with corpus-scaled planes. Cross-bucket recall
    * trades exactly like d_ann_lsh documents (near-dups at threshold
    * 0.9+ almost always share sign bits; a second, rotated plane set
    * OR-ed in would recover the remainder at 2x candidate cost). */
  def semanticDedup(s: SparkSession, embeddings: DataFrame,
                    planes: Int, threshold: Double): DataFrame = {
    require(planes >= 1 && planes <= 16, s"planes $planes outside [1,16]")
    register(s)
    val e = embeddings
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("n", norm("v"))
      .withColumn("bucket", expr(
        s"""aggregate(zip_with(slice(v, 1, $planes), sequence(0, ${planes - 1}),
                              (x, i) -> IF(x >= 0F, shiftleft(1, i), 0)),
                     0, (acc, v) -> acc + v)"""))
    val a = e.select(col("vec_id").as("va"), col("v").as("xa"),
      col("n").as("na"), col("bucket"))
    val b = e.select(col("vec_id").as("vb"), col("v").as("xb"),
      col("n").as("nb"), col("bucket"))
    val pairs = a.join(b, Seq("bucket"))
      .filter(col("va") < col("vb"))
      .withColumn("cos", round(dot("xa", "xb") / (col("na") * col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select("va", "vb")
    val edges = Graph.symmetrize(pairs, "va", "vb").persist()
    val (labels, caches) = Graph.minLabelComponents(edges)
    Materialize.drop(labels
      .select(col("id").as("vec_id"), col("lbl").as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .orderBy("vec_id"), edges +: caches: _*)
  }

  /** IVF-PQ behind `d_ann_ivfpq`.
    *
    * Layout (the standard billion-scale ANN shape): a coarse k-means
    * splits the corpus into `nCells` inverted lists; each vector's
    * PAYLOAD is then m sub-block codebook ids — one byte per block at
    * k ≤ 256 — instead of D floats. A query (a) picks its `nProbe`
    * nearest cells, (b) precomputes one m×k table of squared distances
    * from its sub-blocks to every codebook centroid, (c) scores every
    * candidate in the probed cells by m TABLE LOOKUPS (ADC — no float
    * math per pair), and (d) pays exact cosine only for the `rerank`
    * best. At 100 TB the wins compound: the scan reads codes (m bytes)
    * not vectors, scoring is codegen'd array indexing, and the exact
    * re-rank touches `rerank × |queries|` vectors, not the corpus.
    *
    * Driver-side work is QUERY-scale only, the ANN contract: the query
    * set (the rows a client would send) and the m×k codebooks are
    * collected/broadcast; corpus rows never leave executors. All k-means
    * fits run on the same bounded sample as d_ann_ivf. */
  def ivfPq(s: SparkSession, embeddings: DataFrame, nCells: Int, nProbe: Int,
            m: Int, k: Int, rerank: Int, topK: Int): DataFrame = {
    register(s)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import s.implicits._
    val e0 = embeddings.select(col("vec_id"), col("embedding"))
    val dim = e0.select(size(col("embedding")).as("d")).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m blocks")
    val sub = dim / m

    val e = e0.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>"))).persist()
    val n = e.count()
    val cap = 2000L
    val train = (if (n <= cap) e
                 else e.sample(withReplacement = false, cap.toDouble / n, 42))
      .persist()
    val coarse = new KMeans().setK(nCells).setSeed(42).setMaxIter(10)
      .fit(train.select("features"))
    val blockModels = (0 until m).map { b =>
      new KMeans().setK(k).setSeed(42 + b).setMaxIter(10)
        .fit(train.select(array_to_vector(
          expr(s"CAST(slice(embedding, ${b * sub + 1}, $sub) AS ARRAY<DOUBLE>)"))
          .as("features")))
    }
    // encode the corpus: cell + m codebook ids per vector (one pass,
    // m+1 broadcast-model transforms fused by the planner)
    var enc = coarse.transform(e).withColumnRenamed("prediction", "cell")
    for (b <- 0 until m) {
      enc = blockModels(b).setFeaturesCol(s"f$b").setPredictionCol(s"c$b")
        .transform(enc.withColumn(s"f$b", array_to_vector(
          expr(s"CAST(slice(embedding, ${b * sub + 1}, $sub) AS ARRAY<DOUBLE>)"))))
    }
    val coded = enc.select(col("vec_id").as("n_id"), col("embedding").as("nv"),
      col("cell"), array((0 until m).map(b => col(s"c$b")): _*).as("codes"))
      .withColumn("nn", norm("nv"))

    // query-side: ADC tables + probe cells, computed at query scale
    def sqdist(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var acc = 0.0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val qRows = e0.filter(col("vec_id") < 10).collect() // query set, not corpus
    val blockCenters = blockModels.map(_.clusterCenters.map(_.toArray))
    val coarseCenters = coarse.clusterCenters.map(_.toArray)
    val qFlat = qRows.toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1)
      val qd = qv.map(_.toDouble).toArray
      val tabs: Seq[Seq[Double]] = (0 until m).map { b =>
        val qb = qd.slice(b * sub, (b + 1) * sub)
        blockCenters(b).map(c => sqdist(qb, c)).toSeq
      }
      val cells = coarseCenters.zipWithIndex
        .sortBy { case (c, i) => (sqdist(qd, c), i) }.take(nProbe).map(_._2)
      cells.map(cell => (qid, cell, qv, tabs))
    }
    val qDf = qFlat.toDF("q_id", "cell", "qv", "tabs")
      .withColumn("qv", col("qv").cast("array<float>"))
      .withColumn("qn", norm("qv"))

    val wAdc = Window.partitionBy("q_id").orderBy(col("adc"), col("n_id"))
    val wCos = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    Materialize.drop(coded.join(broadcast(qDf), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adc", expr(
        """aggregate(zip_with(codes, tabs, (c, t) -> element_at(t, c + 1)),
                     0D, (a, x) -> a + x)"""))
      .withColumn("rk", row_number().over(wAdc))
      .filter(col("rk") <= rerank)
      .withColumn("cos", round(dot("qv", "nv") / (col("qn") * col("nn")), 4))
      .withColumn("rnk", row_number().over(wCos))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("n_id"), col("cos"))
      .orderBy("q_id", "rnk"), e, train)
  }

  val oracles: Map[String, String] = Map(
    "d_knn_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         scored AS (
           SELECT q_id, e.vec_id AS n_id,
                  round(list_cosine_similarity(qv, e.v), 4) AS cos
           FROM q JOIN e ON q_id <> e.vec_id)
         SELECT q_id, rnk, n_id, cos FROM (
           SELECT q_id, n_id, cos,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, n_id) AS INT) AS rnk
           FROM scored) WHERE rnk <= 5
         ORDER BY q_id, rnk""",

    "d_dedup_semantic" ->
      """WITH RECURSIVE
         e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
                + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
                + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
                + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
           FROM embeddings),
         edges0 AS (
           SELECT a.vec_id AS va, b.vec_id AS vb
           FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.3),
         edges AS (SELECT va AS a, vb AS b FROM edges0
                   UNION SELECT vb, va FROM edges0),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
         members AS (SELECT DISTINCT a AS vec_id FROM edges),
         clusters AS (
           SELECT m.vec_id, LEAST(m.vec_id, MIN(r.b)) AS cluster_id
           FROM members m LEFT JOIN reach r ON r.a = m.vec_id
           GROUP BY 1)
         SELECT vec_id, cluster_id,
                COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
         FROM clusters ORDER BY vec_id""",

    "d_dedup_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         SELECT a.vec_id AS va, b.vec_id AS vb,
                round(list_cosine_similarity(a.v, b.v), 4) AS cos
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE a.vec_id < 200
           AND round(list_cosine_similarity(a.v, b.v), 4) >= 0.3
         ORDER BY va, vb"""
  )
}
