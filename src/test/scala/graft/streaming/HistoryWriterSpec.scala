package graft.streaming

import java.nio.file.Files

import graft.{Tables, TestSession}
import graft.pipeline.{Backbone, TextDedup}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming history writer closes the warehouse loop: tables a
  * DedupStream ingest persists must be the SAME tables `Backbone.history`
  * builds from the corpus at rest, so the stored-delta probe and the
  * incremental advance can consume either producer interchangeably —
  * and a replayed micro-batch (foreachBatch's at-least-once case) must
  * not duplicate rows.
  */
class HistoryWriterSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def histDocs(split: Long): Seq[DocEvent] = {
    import spark.implicits._
    Tables.documents(spark, sf).select("doc_id", "text")
      .filter(s"doc_id < $split")
      .as[(Long, String)].collect().sortBy(_._1)
      .map((DocEvent.apply _).tupled).toSeq
  }

  private def setRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Set[String])] =
    df.collect().map { r =>
      (r.getLong(r.fieldIndex("doc_id")),
        r.getSeq[String](r.fieldIndex("bgs")).toSet)
    }.toSet

  test("stream-written history tables equal Backbone.history bit for bit") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val split = TextDedup.deltaSplit(spark, sf)
    val docs = histDocs(split)
    assert(docs.nonEmpty)

    val base = Files.createTempDirectory("graft_hist_writer").toString
    val ckpt = Files.createTempDirectory("graft_hist_ckpt").toString
    val ms = MemoryStream[DocEvent]
    val q = DedupStream.historyWriter(ms.toDS(), base)
      .option("checkpointLocation", ckpt).start()
    try {
      // three micro-batches — the multi-partition-dir layout, not a
      // single lucky batch
      docs.grouped(math.max(1, docs.size / 3 + 1)).foreach { g =>
        ms.addData(g: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val (keepers, bands, sets) = DedupStream.readHistoryTables(spark, base)
    val ref = Backbone.history(spark, sf, split)

    val sk = keepers.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val rk = ref.keepers.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sk == rk, s"keepers diverge: ${(sk diff rk).take(3)} / ${(rk diff sk).take(3)}")

    val sb = bands.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val rb = ref.bands.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(sb == rb, s"bands diverge: ${(sb diff rb).take(3)} / ${(rb diff sb).take(3)}")

    // shingle sets: collect_set order is nondeterministic — compare as sets
    assert(setRows(sets) == setRows(ref.sets), "shingle sets diverge")
  }

  test("full chain: stream-written history → compact → advance == rebuild") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val split = TextDedup.deltaSplit(spark, sf)
    val docs = histDocs(split)
    val base = Files.createTempDirectory("graft_hist_chain").toString
    val ckpt = Files.createTempDirectory("graft_chain_ckpt").toString
    val ms = MemoryStream[DocEvent]
    val q = DedupStream.historyWriter(ms.toDS(), base)
      .option("checkpointLocation", ckpt).start()
    try {
      docs.grouped(math.max(1, docs.size / 2 + 1)).foreach { g =>
        ms.addData(g: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val (keepers, bands, sets) = DedupStream.readHistoryTables(spark, base)
    val hist = Backbone.compact(spark, keepers, bands, sets, tag = base)
    val (adv, caches) = Backbone.advancePlan(spark, sf,
      splitOverride = split, histOverride = Some(hist))
    val chained = adv.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    caches.foreach(_.unpersist())
    val full = Backbone.labels(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(chained == full,
      s"stream→compact→advance diverged from rebuild: " +
        s"${(chained -- full).toSeq.sorted.take(5)} / " +
        s"${(full -- chained).toSeq.sorted.take(5)}")
  }

  test("r=4 geometry: stream-written tables == 4x4 batch signing; chain == r=4 rebuild") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val split = TextDedup.deltaSplit(spark, sf)
    val docs = histDocs(split)
    val base = Files.createTempDirectory("graft_hist_r4").toString
    val ckpt = Files.createTempDirectory("graft_r4_ckpt").toString
    val ms = MemoryStream[DocEvent]
    val q = DedupStream.historyWriter(ms.toDS(), base, BandGeometry.R4)
      .option("checkpointLocation", ckpt).start()
    try {
      docs.grouped(math.max(1, docs.size / 2 + 1)).foreach { g =>
        ms.addData(g: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val (keepers, bands, sets) = DedupStream.readHistoryTables(spark, base)
    // stream-written bands equal a fresh 4x4 signing of the same slice
    val hist = Tables.documents(spark, sf).filter(col("doc_id") < split)
    val sp = TextDedup.signaturePlan(hist, nBands = 4, rowsPerBand = 4)
    try {
      val sb = bands.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val rb = sp.bands.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(sb == rb, s"stream-written r=4 bands diverge from batch " +
        s"signing: ${(sb diff rb).take(3)} / ${(rb diff sb).take(3)}")
    } finally sp.caches.foreach(_.unpersist())
    // full chain at the r=4 geometry: compact the stream intake, advance
    // with r=4 batch signatures, compare against the r=4 full rebuild
    val histT = Backbone.compact(spark, keepers, bands, sets, tag = base)
    val (adv, caches) = Backbone.advancePlan(spark, sf, splitOverride = split,
      histOverride = Some(histT), nBands = 4, rowsPerBand = 4)
    val chained = adv.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    caches.foreach(_.unpersist())
    val edgesF = graft.pipeline.Graph.symmetrize(
      Backbone.pairs(spark, sf, nBands = 4, rowsPerBand = 4), "da", "db")
      .persist()
    val (lblF, cF) = graft.pipeline.Graph.minLabelComponents(edgesF)
    val full = lblF.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (edgesF +: cF).foreach(_.unpersist())
    assert(full.nonEmpty, "fixture regression: r=4 rebuild found no clusters")
    assert(chained == full,
      s"r=4 stream→compact→advance diverged from the r=4 rebuild: " +
        s"${(chained -- full).toSeq.sorted.take(5)} / " +
        s"${(full -- chained).toSeq.sorted.take(5)}")
  }

  test("replayed micro-batch overwrites its own partition: no duplicate rows") {
    val split = TextDedup.deltaSplit(spark, sf)
    val docs = histDocs(split).take(10)
    val base = Files.createTempDirectory("graft_hist_replay").toString
    import spark.implicits._
    val df = docs.toDF()

    DedupStream.writeHistoryBatch(df, batchId = 0, base)
    val once = spark.read.parquet(s"$base/fps").count()
    DedupStream.writeHistoryBatch(df, batchId = 0, base) // the replay
    assert(spark.read.parquet(s"$base/fps").count() == once,
      "replayed batch appended duplicate fingerprint rows")
    assert(spark.read.parquet(s"$base/bands").count() ==
      spark.read.parquet(s"$base/bands").dropDuplicates("doc_id", "band").count(),
      "replayed batch appended duplicate band rows")
  }
}
