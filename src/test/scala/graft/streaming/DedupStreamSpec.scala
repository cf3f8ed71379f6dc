package graft.streaming

import graft.{Tables, TestSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def corpus: Seq[DocEvent] = {
    import spark.implicits._
    Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).map((DocEvent.apply _).tupled).toSeq
  }

  test("streaming band keys match the batch bands table bit for bit") {
    val plan = graft.pipeline.TextDedup.minhashPairsPlan(spark, sf)
    try {
      val batch = plan.bands.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val local = corpus.flatMap { d =>
        val sig = DedupStream.signature(d.text)
        if (sig.isEmpty) Seq.empty
        else DedupStream.bandKeys(sig).map { case (b, k) => (d.doc_id, b, k) }
      }.toSet
      assert(local == batch,
        s"streaming hash scheme diverged from batch: ${(local diff batch).take(3)} / ${(batch diff local).take(3)}")
    } finally plan.caches.foreach(_.unpersist())
  }

  test("streaming near-dup pairs: batch-consistent, order-robust, redelivery-safe") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // batch reference: candidate pairs from band collisions with the SAME
    // estimator the stream applies (>= 4 of 8 hashes agree)
    val sigs = corpus.map(d => d.doc_id -> DedupStream.signature(d.text))
      .filter(_._2.nonEmpty).toMap
    val buckets = corpus.flatMap { d =>
      val s = sigs.get(d.doc_id)
      s.toSeq.flatMap(sig =>
        DedupStream.bandKeys(sig).map { case (b, k) => (s"$b|$k", d.doc_id) })
    }.groupBy(_._1).values
    val expected = buckets.flatMap { ms =>
      val ids = ms.map(_._2).distinct.sorted
      for {
        i <- ids.indices; j <- (i + 1) until ids.length
        if DedupStream.estJaccard(sigs(ids(i)), sigs(ids(j))) >= 0.5
      } yield (ids(i), ids(j))
    }.toSet

    def runStream(docs: Seq[Seq[DocEvent]], name: String): Set[(Long, Long)] = {
      val ms = MemoryStream[DocEvent]
      val q = DedupStream.nearDupPairs(ms.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        docs.foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).select("da", "db").distinct()
        .as[(Long, Long)].collect().toSet
    }

    // two micro-batches, doc_id order
    val (b1, b2) = corpus.splitAt(corpus.length / 2)
    val got = runStream(Seq(b1, b2), "neardup_fwd")
    assert(got == expected, s"streaming pairs != batch-estimator pairs: " +
      s"extra=${(got diff expected).take(3)} missing=${(expected diff got).take(3)}")

    // reversed arrival order: same pair set (emission is order-normalized)
    val gotRev = runStream(Seq(b2.reverse, b1.reverse), "neardup_rev")
    assert(gotRev == expected, "pair set must not depend on arrival order")

    // recall vs the batch EXACT-verified pairs: the 8-hash estimator must
    // rediscover most true near-dups (deterministic given the corpus)
    val verified = graft.pipeline.TextDedup.queries("d_dedup_minhash")(spark, sf)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val recall = verified.count(got.contains).toDouble / verified.size
    assert(recall >= 0.7, s"estimator recall vs batch-verified too low: $recall")

    // at-least-once: redelivering half of batch 1 must add nothing
    val ms = MemoryStream[DocEvent]
    val q = DedupStream.nearDupPairs(ms.toDS())
      .writeStream.format("memory").queryName("neardup_redeliver")
      .outputMode("append").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val before = spark.table("neardup_redeliver").count()
      ms.addData(b1.take(b1.length / 2)); q.processAllAvailable()
      assert(spark.table("neardup_redeliver").count() == before,
        "redelivered docs re-emitted pairs")
    } finally q.stop()
  }

  test("near-dup state survives a checkpointed restart: no loss, no re-emission") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("dedup_ckpt").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val (b1, b2) = corpus.splitAt(corpus.length / 2)
    val schema = spark.emptyDataset[DocEvent].schema
    def stream() = DedupStream.nearDupPairs(
      spark.readStream.schema(schema).parquet(in).as[DocEvent])
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // run 1: first half, then stop (checkpoint holds the bucket state)
    b1.toDS().repartition(1).write.mode("append").parquet(in)
    val q1 = stream()
    try q1.processAllAvailable() finally q1.stop()
    val afterB1 = spark.read.parquet(out).count()

    // run 2: fresh query, SAME checkpoint — the file source does not
    // re-read committed files, and the bucket state must resume so pairs
    // spanning the restart (one member per half) are still found
    b2.toDS().repartition(1).write.mode("append").parquet(in)
    val q2 = stream()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(out)
    val got = rows.select("da", "db").distinct().as[(Long, Long)].collect().toSet
    // reference: one uninterrupted stream over the same corpus
    val refRows = {
      val ms = MemoryStream[DocEvent]
      val q = DedupStream.nearDupPairs(ms.toDS())
        .writeStream.format("memory").queryName("neardup_ref")
        .outputMode("append").start()
      try { ms.addData(b1); q.processAllAvailable()
            ms.addData(b2); q.processAllAvailable() } finally q.stop()
      spark.table("neardup_ref")
    }
    val ref = refRows.select("da", "db").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got == ref, s"restart lost or invented pairs: " +
      s"extra=${(got diff ref).take(3)} missing=${(ref diff got).take(3)}")
    // no re-emission across the restart: the per-band emission count
    // (a pair emits once per colliding band by design) matches the
    // uninterrupted run exactly
    assert(rows.count() == refRows.count(),
      s"restart changed emission count: ${rows.count()} vs ${refRows.count()}")
    assert(afterB1 < rows.count(), "cross-restart pairs missing")
  }

  test("history-bootstrapped stream: delta verdicts without re-streaming history") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val (hist, batch) = corpus.splitAt(corpus.length / 2)

    // reference: the full corpus through one stream — every pair emits
    // when its LATER (max-id, in doc_id-ordered arrival) member arrives,
    // so the expected delta output is the pairs whose later member
    // streams in the batch half
    val msRef = MemoryStream[DocEvent]
    val qRef = DedupStream.nearDupPairs(msRef.toDS())
      .writeStream.format("memory").queryName("hist_ref")
      .outputMode("append").start()
    try { msRef.addData(hist); qRef.processAllAvailable()
          msRef.addData(batch); qRef.processAllAvailable() } finally qRef.stop()
    val split = batch.head.doc_id
    val expected = spark.table("hist_ref").select("da", "db").distinct()
      .as[(Long, Long)].collect().toSet[(Long, Long)]
      .filter { case (a, b) => math.max(a, b) >= split }

    // delta run: history seeds the state; only the batch half streams
    val ms = MemoryStream[DocEvent]
    val q = DedupStream.nearDupPairsWithHistory(ms.toDS(), hist.toDS())
      .writeStream.format("memory").queryName("hist_delta")
      .outputMode("append").start()
    try { ms.addData(batch); q.processAllAvailable() } finally q.stop()
    val got = spark.table("hist_delta").select("da", "db").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got == expected, s"delta stream diverged from full-stream tail: " +
      s"extra=${(got diff expected).take(3)} missing=${(expected diff got).take(3)}")
    assert(got.exists { case (a, b) => math.min(a, b) < split },
      "expected at least one history x batch cross pair")
  }

  test("history-bootstrapped exact decisions flag dups against history keepers") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val (hist, batch0) = corpus.splitAt(2 * corpus.length / 3)
    // plant a guaranteed history dup: a new id re-submitting history text
    val batch = batch0 :+ DocEvent(corpus.last.doc_id + 1, hist.head.text)
    val histKeep = hist.groupBy(d => d.text.toLowerCase)
      .map { case (_, ds) => ds.map(_.doc_id).min -> ds.map(_.text.toLowerCase).head }
      .map { case (id, txt) => txt -> id }.toMap
    val ms = MemoryStream[DocEvent]
    val q = DedupStream.exactDecisionsWithHistory(ms.toDS(), hist.toDS())
      .writeStream.format("memory").queryName("exact_hist")
      .outputMode("append").start()
    try { ms.addData(batch); q.processAllAvailable() } finally q.stop()
    val got = spark.table("exact_hist").as[ExactDecision].collect()
      .map(d => d.doc_id -> d).toMap
    assert(got.size == batch.length)
    batch.foreach { d =>
      histKeep.get(d.text.toLowerCase) match {
        case Some(hk) => // history holds this text: keeper is history's
          assert(got(d.doc_id).keep_id == hk && got(d.doc_id).is_dup,
            s"doc ${d.doc_id} should be a dup of history keeper $hk")
        case None => // new text: first batch arrival keeps it
          assert(got(d.doc_id).keep_id >= batch.head.doc_id)
          assert(got(d.doc_id).is_dup == (got(d.doc_id).keep_id != d.doc_id))
      }
    }
    assert(got.values.exists(_.is_dup), "expected at least one history dup")
  }

  test("streaming exact decisions agree with batch keepers in arrival order") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val batch = graft.pipeline.TextDedup.queries("d_dedup_exact")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap // fp -> keeper

    val ms = MemoryStream[DocEvent]
    val q = DedupStream.exactDecisions(ms.toDS())
      .writeStream.format("memory").queryName("exact_out")
      .outputMode("append").start()
    val (b1, b2) = corpus.splitAt(corpus.length / 3)
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("exact_out")
      .as[ExactDecision].collect().map(d => d.doc_id -> d).toMap
    assert(got.size == corpus.length)
    // doc_id-ordered arrival => first-seen == min-doc_id == batch keeper
    val fps = corpus.map(d => d.doc_id ->
      java.security.MessageDigest.getInstance("MD5")
        .digest(d.text.toLowerCase.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).toMap
    corpus.foreach { d =>
      val expKeep = batch(fps(d.doc_id))
      assert(got(d.doc_id).keep_id == expKeep, s"doc ${d.doc_id}")
      assert(got(d.doc_id).is_dup == (d.doc_id != expKeep))
    }
  }
}
