package graft.streaming

import java.nio.file.Files

import graft.TestSession
import graft.pipeline.{Similarity, VecBackbone}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The streaming vector-index writer closes the embedding warehouse
  * loop: tables a VecIndexStream ingest persists must be the SAME
  * tables `VecBackbone.history` builds from the corpus at rest, so the
  * stored-delta probe and the incremental advance can consume either
  * producer interchangeably — and a replayed micro-batch must not
  * duplicate rows.
  */
class VecIndexStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def histVecs(split: Long): Seq[VecEvent] = {
    import spark.implicits._
    graft.Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .filter(s"vec_id < $split")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
      .map((VecEvent.apply _).tupled).toSeq
  }

  private def bucketRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(r.fieldIndex("vec_id")),
        r.getInt(r.fieldIndex("bucket")),
        r.getSeq[Float](r.fieldIndex("v")))
    }.toSet

  private def codeRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(r.fieldIndex("vec_id")),
        r.getInt(r.fieldIndex("cell")),
        r.getSeq[Int](r.fieldIndex("codes")))
    }.toSet

  test("stream-written index tables equal VecBackbone.history bit for bit") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val split = VecBackbone.deltaSplit(spark, sf)
    val vecs = histVecs(split)
    assert(vecs.nonEmpty)
    val q = VecBackbone.quantizer(spark, sf) // the pinned artifact
    val base = Files.createTempDirectory("graft_vec_writer").toString
    val ckpt = Files.createTempDirectory("graft_vec_ckpt").toString
    val ms = MemoryStream[VecEvent]
    val w = VecIndexStream.indexWriter(ms.toDS(), base, q)
      .option("checkpointLocation", ckpt).start()
    try {
      // three micro-batches — the multi-partition-dir layout
      vecs.grouped(math.max(1, vecs.size / 3 + 1)).foreach { g =>
        ms.addData(g: _*); w.processAllAvailable()
      }
    } finally w.stop()
    val (buckets, codes) = VecIndexStream.readIndexTables(spark, base)
    val ref = VecBackbone.history(spark, sf, split)
    assert(bucketRows(buckets) == bucketRows(ref.buckets),
      "stream-written buckets diverge from the batch build")
    assert(codeRows(codes) == codeRows(ref.codes),
      "stream-written codes diverge from the batch build")
  }

  test("full chain: stream-written index → compact → advance == full re-clustering") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val split = VecBackbone.deltaSplit(spark, sf)
    val vecs = histVecs(split)
    val q = VecBackbone.quantizer(spark, sf)
    val base = Files.createTempDirectory("graft_vec_chain").toString
    val ckpt = Files.createTempDirectory("graft_vchain_ckpt").toString
    val ms = MemoryStream[VecEvent]
    val w = VecIndexStream.indexWriter(ms.toDS(), base, q)
      .option("checkpointLocation", ckpt).start()
    try {
      vecs.grouped(math.max(1, vecs.size / 2 + 1)).foreach { g =>
        ms.addData(g: _*); w.processAllAvailable()
      }
    } finally w.stop()
    val (buckets, codes) = VecIndexStream.readIndexTables(spark, base)
    val hist = VecBackbone.compact(spark, buckets, codes, tag = base)
    val p = VecBackbone.advanceParts(spark, sf, splitOverride = split,
      histOverride = Some(hist))
    val chained = p.labels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    p.caches.foreach(_.unpersist())
    val full = Similarity
      .semanticDedup(spark, graft.Tables.embeddings(spark, sf),
        planes = VecBackbone.Planes, threshold = VecBackbone.Threshold)
      .select("vec_id", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(chained == full,
      s"stream→compact→advance diverged from the full re-clustering: " +
        s"${(chained -- full).toSeq.sorted.take(5)} / " +
        s"${(full -- chained).toSeq.sorted.take(5)}")
  }

  test("BANDED chain: stream postings → compactBanded → advanceBanded == full banded rebuild") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val split = VecBackbone.deltaSplit(spark, sf)
    val vecs = histVecs(split)
    val q = VecBackbone.quantizer(spark, sf)
    val base = Files.createTempDirectory("graft_vecb_chain").toString
    val ckpt = Files.createTempDirectory("graft_vbchain_ckpt").toString
    val ms = MemoryStream[VecEvent]
    val w = VecIndexStream.indexWriter(ms.toDS(), base, q)
      .option("checkpointLocation", ckpt).start()
    try {
      vecs.grouped(math.max(1, vecs.size / 2 + 1)).foreach { g =>
        ms.addData(g: _*); w.processAllAvailable()
      }
    } finally w.stop()
    // stream-written postings are bit-identical to the batch derivation
    val post = VecIndexStream.readBandedPostings(spark, base)
    val ref = Similarity.bandedSignBuckets(spark,
      graft.Tables.embeddings(spark, sf).filter(col("vec_id") < split),
      VecBackbone.Bands, VecBackbone.Planes)
    def postingRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getInt(r.fieldIndex("band")), r.getInt(r.fieldIndex("bucket")))).toSet
    assert(postingRows(post) == postingRows(ref),
      "stream-written banded postings diverge from the batch derivation")
    // compact into banded history state, then advance — must equal the
    // from-scratch banded re-clustering over the FULL corpus
    val (buckets, _) = VecIndexStream.readIndexTables(spark, base)
    val hist = VecBackbone.compactBanded(spark, post,
      buckets.select("vec_id", "v", "n"), tag = base)
    val chained = VecBackbone.advanceBanded(spark, sf, splitOverride = split,
        histOverride = Some(hist),
        hVecsOverride = Some(buckets.select("vec_id", "v", "n", "bucket")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity
      .semanticDedupBanded(spark, graft.Tables.embeddings(spark, sf),
        bands = VecBackbone.Bands, planes = VecBackbone.Planes,
        threshold = VecBackbone.Threshold)
      .select("vec_id", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(chained == full,
      s"banded stream→compact→advance diverged from the full rebuild: " +
        s"${(chained -- full).toSeq.sorted.take(5)} / " +
        s"${(full -- chained).toSeq.sorted.take(5)}")
  }

  test("SEEDED geometry rides the streamed index: stream == batch == " +
    "probe, advance == full seeded rebuild, geometry read from the store") {
    // VERDICT r14 #3: the production seeded random-hyperplane geometry
    // could only run the stateless path — the streamed index pinned the
    // axis geometry. Here a seeded BandedGeom streams end to end: the
    // writer persists (seed, bands, planes, dims) at the index root,
    // every consumer READS the geometry from the store (compactBanded's
    // state carries it; advanceBanded probes under h.geom, not an
    // argument), and the chained labels equal the from-scratch seeded
    // rebuild.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val split = VecBackbone.deltaSplit(spark, sf)
    val vecs = histVecs(split)
    val dims = vecs.head.embedding.size
    val geom = graft.pipeline.BandedGeom.seeded(
      bands = 2, planes = 6, seed = 7L, dims = dims)
    val q = VecBackbone.quantizer(spark, sf)
    val base = Files.createTempDirectory("graft_vecs_chain").toString
    val ckpt = Files.createTempDirectory("graft_vschain_ckpt").toString
    val ms = MemoryStream[VecEvent]
    val w = VecIndexStream.indexWriter(ms.toDS(), base, q, geom = geom)
      .option("checkpointLocation", ckpt).start()
    try {
      vecs.grouped(math.max(1, vecs.size / 3 + 1)).foreach { g =>
        ms.addData(g: _*); w.processAllAvailable()
      }
    } finally w.stop()
    // the geometry comes back from the STORE, not the writer's args
    val stored = VecIndexStream.readBandedGeom(spark, base)
    assert(stored == geom, s"stored geometry $stored != written $geom")
    // stream == pinned batch derivation == stateless probing derivation
    val hSlice = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < split)
    def postingRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getInt(r.fieldIndex("band")), r.getInt(r.fieldIndex("bucket")))).toSet
    val post = VecIndexStream.readBandedPostings(spark, base)
    val pinned = Similarity.bandedSignBucketsGeom(spark, hSlice, stored)
    val probed = Similarity.bandedSignBuckets(spark, hSlice,
      geom.bands, geom.planes, geom.seed)
    assert(postingRows(post) == postingRows(pinned),
      "stream-written seeded postings diverge from the pinned derivation")
    assert(postingRows(pinned) == postingRows(probed),
      "pinned (dims from geom) and probing (dims from data) seeded " +
        "derivations disagree")
    // compact under the stored geometry, advance under h.geom
    val (buckets, _) = VecIndexStream.readIndexTables(spark, base)
    val hist = VecBackbone.compactBanded(spark, post,
      buckets.select("vec_id", "v", "n"), tag = base, geom = stored)
    assert(hist.geom == geom, "compacted state lost the geometry")
    val chained = VecBackbone.advanceBanded(spark, sf, splitOverride = split,
        histOverride = Some(hist),
        hVecsOverride = Some(buckets.select("vec_id", "v", "n", "bucket")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity
      .semanticDedupBanded(spark, graft.Tables.embeddings(spark, sf),
        bands = geom.bands, planes = geom.planes,
        threshold = VecBackbone.Threshold, lshSeed = geom.seed)
      .select("vec_id", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(chained == full,
      s"seeded stream→compact→advance diverged from the full rebuild: " +
        s"${(chained -- full).toSeq.sorted.take(5)} / " +
        s"${(full -- chained).toSeq.sorted.take(5)}")
  }

  test("empty micro-batch at a seeded geometry costs no probe and no rows") {
    // the pinned-geometry path derives planes from (seed, dims) alone —
    // an empty slice must write an empty (not crashed, not null-bucket)
    // posting partition
    import spark.implicits._
    val q = VecBackbone.quantizer(spark, sf)
    val base = Files.createTempDirectory("graft_vec_empty").toString
    val geom = graft.pipeline.BandedGeom.seeded(2, 6, 7L, 8)
    val empty = Seq.empty[VecEvent].toDF("vec_id", "embedding")
    VecIndexStream.writeIndexBatch(empty, 0L, base, q, geom = geom)
    assert(VecIndexStream.readBandedPostings(spark, base).count() == 0L)
    assert(VecIndexStream.readBandedGeom(spark, base) == geom)
  }

  test("failure soak: mid-batch kill + checkpoint replay under RocksDB — " +
    "zero loss, zero duplicates") {
    // The wire relay has a drop/lost-ack soak (ServeMainSpec); this is the
    // vector ingest writer's equivalent (VERDICT r12 #7): a worker dies
    // BETWEEN the two table writes of one micro-batch (buckets landed,
    // codes didn't — the torn state the batch=<id> overwrite contract
    // must heal), the query restarts from its checkpoint, Spark replays
    // the same offsets under the same batchId, and the final tables must
    // be bit-equal to the batch build — no lost vector, no duplicate row.
    // Runs under RocksDBStateStoreProvider, the corpus-scale store the
    // Scaladoc prescribes.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val split = VecBackbone.deltaSplit(spark, sf)
      val vecs = histVecs(split)
      val q = VecBackbone.quantizer(spark, sf)
      val base = Files.createTempDirectory("graft_vec_soak").toString
      val ckpt = Files.createTempDirectory("graft_vsoak_ckpt").toString
      val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val ms = MemoryStream[VecEvent]
      def startWriter() = ms.toDS().writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[VecEvent],
                         id: Long) =>
          if (id == 1 && !killed.getAndSet(true)) {
            // the injected kill: the REAL bucket derivation lands, then
            // the worker dies before the code table write
            Similarity.register(spark)
            Similarity.signBuckets(spark,
                batch.toDF().select(col("vec_id"),
                  col("embedding").cast("array<float>")),
                VecBackbone.Planes)
              .write.mode("overwrite").parquet(s"$base/buckets/batch=$id")
            throw new RuntimeException("injected mid-batch kill")
          }
          VecIndexStream.writeIndexBatch(batch.toDF(), id, base, q)
        }.start()
      val thirds = vecs.grouped(math.max(1, vecs.size / 3 + 1)).toSeq
      val w1 = startWriter()
      ms.addData(thirds.head: _*); w1.processAllAvailable()
      ms.addData(thirds(1): _*)
      val err = intercept[Exception] { w1.processAllAvailable(); w1.awaitTermination() }
      assert(err.getMessage != null)
      // the query terminated WITH an exception by design; clear it from
      // the shared session's terminated list or any later suite calling
      // awaitAnyTermination (Ops' drain) inherits the injected kill
      spark.streams.resetTerminated()
      // the torn state is REAL before the restart: batch 1's buckets
      // exist, its codes don't
      assert(new java.io.File(s"$base/buckets/batch=1").exists(),
        "injection failed: bucket partition missing")
      assert(!new java.io.File(s"$base/codes/batch=1").exists(),
        "injection failed: code partition landed before the kill")
      // restart from the checkpoint: batch 1 replays under the SAME id
      // (healing the torn partitions by overwrite), then batch 2 streams
      val w2 = startWriter()
      w2.processAllAvailable()
      ms.addData(thirds.drop(2).flatten: _*); w2.processAllAvailable()
      w2.stop()
      assert(new java.io.File(s"$base/codes/batch=1").exists(),
        "replay did not heal the torn code partition")
      val (buckets, codes) = VecIndexStream.readIndexTables(spark, base)
      val ref = VecBackbone.history(spark, sf, split)
      assert(bucketRows(buckets) == bucketRows(ref.buckets),
        "post-kill tables lost or duplicated bucket rows vs the batch build")
      assert(codeRows(codes) == codeRows(ref.codes),
        "post-kill tables lost or duplicated code rows vs the batch build")
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("replayed micro-batch overwrites its own partition: no duplicate rows") {
    import spark.implicits._
    val q = VecBackbone.quantizer(spark, sf)
    val base = Files.createTempDirectory("graft_vec_replay").toString
    val vecs = histVecs(20L)
    val batch = vecs.toDF("vec_id", "embedding")
    VecIndexStream.writeIndexBatch(batch, 0L, base, q)
    VecIndexStream.writeIndexBatch(batch, 0L, base, q) // at-least-once replay
    val (buckets, codes) = VecIndexStream.readIndexTables(spark, base)
    assert(buckets.count() == vecs.size, "replay duplicated bucket rows")
    assert(codes.count() == vecs.size, "replay duplicated code rows")
  }

  test("SQ8 codes ride the stream under the pinned scale; another scale refuses") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val split = VecBackbone.deltaSplit(spark, sf)
    val vecs = histVecs(split)
    val q = VecBackbone.quantizer(spark, sf)
    val sc = VecBackbone.sq8ScaleAt(spark, sf, split) // the pinned artifact
    val base = Files.createTempDirectory("graft_sq8_writer").toString
    val ckpt = Files.createTempDirectory("graft_sq8_ckpt").toString
    val ms = MemoryStream[VecEvent]
    val w = VecIndexStream.indexWriter(ms.toDS(), base, q, sq8Scale = Some(sc))
      .option("checkpointLocation", ckpt).start()
    try {
      vecs.grouped(math.max(1, vecs.size / 3 + 1)).foreach { g =>
        ms.addData(g: _*); w.processAllAvailable()
      }
    } finally w.stop()
    def sq8Rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        (r.getLong(r.fieldIndex("vec_id")),
          r.getSeq[Long](r.fieldIndex("codes")).toList,
          r.getLong(r.fieldIndex("qq")))
      }.toSet
    // stream-written codes == the batch pipeline's own history build
    // under the same pinned scale, bit for bit — either producer feeds
    // sq8Advance interchangeably
    assert(sq8Rows(VecIndexStream.readSq8Codes(spark, base)) ==
      sq8Rows(VecBackbone.sq8CodesAt(spark, sf, split)),
      "stream-written SQ8 codes diverge from the batch build")
    assert(VecIndexStream.readSq8Scale(spark, base).contains(sc))
    // a restart under a DIFFERENT scale must refuse, not mix code tables
    val bad = graft.Tables.embeddings(spark, sf).filter("vec_id < 3")
      .select(col("vec_id"), col("embedding"))
    val err = intercept[IllegalArgumentException] {
      VecIndexStream.writeIndexBatch(bad, 99L, base, q, sq8Scale = Some(sc * 2))
    }
    assert(err.getMessage.contains("refusing"), err.getMessage)
    // ...and a RETRY after the refusal must refuse AGAIN — a memoize-
    // before-validate bug would wave the second attempt through and
    // write the mixed-scale table the guard exists to prevent
    val err2 = intercept[IllegalArgumentException] {
      VecIndexStream.writeIndexBatch(bad, 99L, base, q, sq8Scale = Some(sc * 2))
    }
    assert(err2.getMessage.contains("refusing"), err2.getMessage)
    // a writer redeployed WITHOUT the scale on an SQ8-carrying index
    // must refuse too — silently dropping the table's maintenance gives
    // readers a partially-populated index with no signal
    val err3 = intercept[IllegalArgumentException] {
      VecIndexStream.writeIndexBatch(bad, 99L, base, q, sq8Scale = None)
    }
    assert(err3.getMessage.contains("sq8Scale"), err3.getMessage)
  }
}
