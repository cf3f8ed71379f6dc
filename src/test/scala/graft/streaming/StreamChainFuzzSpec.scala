package graft.streaming

import java.nio.file.Files

import graft.TestSession
import graft.pipeline.{Backbone, BandedGeom, Similarity, TextDedup, VecBackbone}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Stream-chain FUZZ (VERDICT r14 #4): the fixed-cut chain specs
  * (HistoryWriterSpec, VecIndexStreamSpec) pin stream → compact →
  * advance == full rebuild at one split and one batch shape each; this
  * harness owns the RANDOM ones — per seed it plants a random corpus
  * (near-dup cliques of random size/mutation plus background noise, ids
  * SHUFFLED so the history split cuts cliques at random phase), streams
  * the history half through the REAL writers in a random number of
  * micro-batches cut at random boundaries, compacts, advances, and
  * asserts equality with the from-scratch rebuild — on the TEXT side,
  * the VECTOR single-band side, and the VECTOR side at a SEEDED banded
  * geometry (the round-15 pinned-geometry path). Runs in the round
  * gate's `sbt test` stage at 3 seeds; every draw is reproducible from
  * its seed alone.
  */
class StreamChainFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** Random documents + embeddings corpus in a fresh dir; returns
    * (dir, nDocs, nVecs, dims). */
  private def plant(seed: Int): (String, Int, Int, Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed * 7919 + 17)
    val vocab = (0 until 60).map(i => s"w$i")
    val docs = scala.collection.mutable.Buffer[String]()
    (0 until 5 + rnd.nextInt(8)).foreach { _ =>
      val base = Seq.fill(9 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      (0 until 2 + rnd.nextInt(4)).foreach { _ =>
        val t = base.toArray
        (0 until rnd.nextInt(3)).foreach { _ =>
          t(rnd.nextInt(t.length)) = vocab(rnd.nextInt(vocab.size))
        }
        docs += t.mkString(" ")
      }
    }
    (0 until 30 + rnd.nextInt(60)).foreach { _ =>
      docs += Seq.fill(6 + rnd.nextInt(10))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val shuffledDocs = rnd.shuffle(docs.toSeq).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", s"src${i % 3}", t.length.toLong) }

    val dims = Seq(8, 16, 32)(rnd.nextInt(3))
    val vecs = scala.collection.mutable.Buffer[Array[Float]]()
    (0 until 4 + rnd.nextInt(6)).foreach { _ =>
      val base = Array.fill(dims)((rnd.nextFloat() - 0.5f) * 2f)
      (0 until 2 + rnd.nextInt(4)).foreach { _ =>
        vecs += base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.08f)
      }
    }
    (0 until 25 + rnd.nextInt(50)).foreach(_ =>
      vecs += Array.fill(dims)(rnd.nextFloat() - 0.5f))
    val shuffledVecs = rnd.shuffle(vecs.toSeq).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }

    val dir = Files.createTempDirectory(s"graft_scfuzz_$seed").toString
    shuffledDocs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    shuffledVecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    (dir, shuffledDocs.size, shuffledVecs.size, dims)
  }

  /** Random micro-batch cuts of [0, n): 2-4 slices at random sorted
    * boundaries — the shape foreachBatch actually sees. */
  private def cuts(rnd: scala.util.Random, n: Int): Seq[(Int, Int)] = {
    val k = 2 + rnd.nextInt(3)
    val bounds = (Seq(0, n) ++ Seq.fill(k - 1)(rnd.nextInt(math.max(1, n))))
      .distinct.sorted
    bounds.zip(bounds.tail)
  }

  private def twoLongs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  Seq(3, 5, 8).foreach { seed =>
    test(s"seed $seed: random corpus + random cuts — text chain == rebuild") {
      import spark.implicits._
      implicit val sq = spark.sqlContext
      val rnd = new scala.util.Random(seed * 104729 + 1)
      val (dir, nDocs, _, _) = plant(seed)
      val split = (nDocs / 4 + rnd.nextInt(nDocs / 2)).toLong
      val docs = graft.Tables.documents(spark, dir)
        .filter(col("doc_id") < split).select("doc_id", "text")
        .as[(Long, String)].collect().sortBy(_._1)
        .map((DocEvent.apply _).tupled).toSeq
      val base = Files.createTempDirectory(s"graft_scfuzz_t$seed").toString
      val ckpt = Files.createTempDirectory(s"graft_scfuzz_tc$seed").toString
      val ms = MemoryStream[DocEvent]
      val q = DedupStream.historyWriter(ms.toDS(), base)
        .option("checkpointLocation", ckpt).start()
      try {
        cuts(rnd, docs.size).foreach { case (lo, hi) =>
          ms.addData(docs.slice(lo, hi): _*); q.processAllAvailable()
        }
      } finally q.stop()
      val (keepers, bands, sets) = DedupStream.readHistoryTables(spark, base)
      val hist = Backbone.compact(spark, keepers, bands, sets, tag = base)
      val (adv, caches) = Backbone.advancePlan(spark, dir,
        splitOverride = split, histOverride = Some(hist))
      val chained = twoLongs(adv)
      caches.foreach(_.unpersist())
      val full = twoLongs(Backbone.labels(spark, dir))
      assert(chained == full,
        s"text stream chain diverged at seed $seed split $split: " +
          s"${(chained -- full).toSeq.sorted.take(5)} / " +
          s"${(full -- chained).toSeq.sorted.take(5)}")
    }

    test(s"seed $seed: random corpus + random cuts — vector chains " +
      "(single-band + seeded banded) == rebuilds") {
      import spark.implicits._
      implicit val sq = spark.sqlContext
      val rnd = new scala.util.Random(seed * 7561 + 3)
      val (dir, _, nVecs, dims) = plant(seed + 100)
      val split = (nVecs / 4 + rnd.nextInt(nVecs / 2)).toLong
      val vecs = graft.Tables.embeddings(spark, dir)
        .filter(col("vec_id") < split).select("vec_id", "embedding")
        .as[(Long, Seq[Float])].collect().sortBy(_._1)
        .map((VecEvent.apply _).tupled).toSeq
      val geom = BandedGeom.seeded(bands = 2, planes = 4 + rnd.nextInt(3),
        seed = seed * 37L + 5, dims = dims)
      val q = VecBackbone.quantizer(spark, dir)
      val base = Files.createTempDirectory(s"graft_scfuzz_v$seed").toString
      val ckpt = Files.createTempDirectory(s"graft_scfuzz_vc$seed").toString
      val ms = MemoryStream[VecEvent]
      val w = VecIndexStream.indexWriter(ms.toDS(), base, q, geom = geom)
        .option("checkpointLocation", ckpt).start()
      try {
        cuts(rnd, vecs.size).foreach { case (lo, hi) =>
          ms.addData(vecs.slice(lo, hi): _*); w.processAllAvailable()
        }
      } finally w.stop()
      val (buckets, codes) = VecIndexStream.readIndexTables(spark, base)

      // single-band chain
      val hist = VecBackbone.compact(spark, buckets, codes, tag = base)
      val p = VecBackbone.advanceParts(spark, dir, splitOverride = split,
        histOverride = Some(hist))
      val chained = twoLongs(p.labels)
      p.caches.foreach(_.unpersist())
      val full = twoLongs(Similarity
        .semanticDedup(spark, graft.Tables.embeddings(spark, dir),
          planes = VecBackbone.Planes, threshold = VecBackbone.Threshold)
        .select("vec_id", "cluster_id"))
      assert(chained == full,
        s"vector single-band chain diverged at seed $seed split $split")

      // seeded banded chain, geometry read back FROM THE STORE
      val stored = VecIndexStream.readBandedGeom(spark, base)
      assert(stored == geom, s"sidecar lost the geometry: $stored")
      val post = VecIndexStream.readBandedPostings(spark, base)
      val bHist = VecBackbone.compactBanded(spark, post,
        buckets.select("vec_id", "v", "n"), tag = base, geom = stored)
      val bChained = twoLongs(VecBackbone.advanceBanded(spark, dir,
        splitOverride = split, histOverride = Some(bHist),
        hVecsOverride = Some(buckets.select("vec_id", "v", "n", "bucket"))))
      val bFull = twoLongs(Similarity
        .semanticDedupBanded(spark, graft.Tables.embeddings(spark, dir),
          bands = geom.bands, planes = geom.planes,
          threshold = VecBackbone.Threshold, lshSeed = geom.seed)
        .select("vec_id", "cluster_id"))
      assert(bChained == bFull,
        s"vector seeded-banded chain diverged at seed $seed split $split " +
          s"geom $geom: ${(bChained -- bFull).toSeq.sorted.take(5)} / " +
          s"${(bFull -- bChained).toSeq.sorted.take(5)}")
    }
  }
}
