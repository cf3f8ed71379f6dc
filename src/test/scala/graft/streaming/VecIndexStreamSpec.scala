package graft.streaming

import java.nio.file.Files

import graft.TestSession
import graft.pipeline.{Similarity, VecBackbone}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}
