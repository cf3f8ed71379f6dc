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

  test("streaming band keys match the batch r=4 bands table bit for bit") {
    // the floor-suppressing 4x4 geometry (d_dedup_delta_r4's operating
    // point) — the stream must be able to maintain ITS tables too
    val plan = graft.pipeline.TextDedup.minhashPairsPlan(spark, sf,
      nBands = 4, rowsPerBand = 4)
    try {
      val batch = plan.bands.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val g = BandGeometry.R4
      val local = corpus.flatMap { d =>
        val sig = DedupStream.signature(d.text, g)
        if (sig.isEmpty) Seq.empty
        else DedupStream.bandKeys(sig, g).map { case (b, k) => (d.doc_id, b, k) }
      }.toSet
      assert(local == batch,
        s"r=4 streaming hash scheme diverged from batch: " +
          s"${(local diff batch).take(3)} / ${(batch diff local).take(3)}")
    } finally plan.caches.foreach(_.unpersist())
  }

  test("tokenizer parity on trailing/odd whitespace (Spark split keeps empties)") {
    import spark.implicits._
    // Java's String.split(" ") drops trailing empty tokens; Spark's
    // split() keeps them — a divergence here silently changes band keys
    // for whitespace-suffixed text (recall loss, not an error)
    val texts = Seq("alpha beta ", "alpha  beta", " alpha beta", "a b c  ")
    val batchBigrams = texts.toDF("text")
      .selectExpr("text",
        """transform(sequence(1, size(split(text, ' ')) - 1),
             i -> concat(element_at(split(text, ' '), i), ' ',
                         element_at(split(text, ' '), i + 1))) AS bgs""")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    texts.foreach { t =>
      val w = t.split(" ", -1)
      val streamBigrams =
        (0 until math.max(0, w.length - 1)).map(i => w(i) + " " + w(i + 1)).toSet
      assert(streamBigrams == batchBigrams(t),
        s"tokenizer divergence on '$t': $streamBigrams vs ${batchBigrams(t)}")
      // and the signatures themselves agree for whitespace-suffixed twins
      assert(DedupStream.signature(t).nonEmpty)
    }
    assert(DedupStream.signature("alpha beta") !=
      DedupStream.signature("alpha beta "),
      "batch split distinguishes the trailing-space twin; streaming must too")
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

  test("default minAgree tracks the geometry: jaccard 0.5 at R4, not a fixed count") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the same batch-estimator reference as above, at the R4 geometry —
    // a fixed minAgree=4 of 16 hashes would admit est >= 0.25 pairs the
    // batch r=4 verify contract (jaccard >= 0.5) rejects
    val g = BandGeometry.R4
    val sigs = corpus.map(d => d.doc_id -> DedupStream.signature(d.text, g))
      .filter(_._2.nonEmpty).toMap
    val buckets = corpus.flatMap { d =>
      sigs.get(d.doc_id).toSeq.flatMap(sig =>
        DedupStream.bandKeys(sig, g).map { case (b, k) => (s"$b|$k", d.doc_id) })
    }.groupBy(_._1).values
    val expected = buckets.flatMap { ms =>
      val ids = ms.map(_._2).distinct.sorted
      for {
        i <- ids.indices; j <- (i + 1) until ids.length
        if DedupStream.estJaccard(sigs(ids(i)), sigs(ids(j))) >= 0.5
      } yield (ids(i), ids(j))
    }.toSet
    val ms = MemoryStream[DocEvent]
    val q = DedupStream.nearDupPairs(ms.toDS(), geometry = g)
      .writeStream.format("memory").queryName("neardup_r4")
      .outputMode("append").start()
    try {
      ms.addData(corpus); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("neardup_r4").select("da", "db").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"R4 default threshold diverged from jaccard>=0.5: " +
        s"extra=${(got diff expected).take(3)} " +
        s"missing=${(expected diff got).take(3)}")
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

  test("near-dup verdicts identical under the RocksDB state store") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val (b1, b2) = corpus.splitAt(corpus.length / 2)
    def runWith(provider: Option[String], name: String): Set[(Long, Long)] = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      provider.foreach(spark.conf.set(key, _))
      try {
        val ms = MemoryStream[DocEvent]
        val q = DedupStream.nearDupPairs(ms.toDS())
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try { ms.addData(b1); q.processAllAvailable()
              ms.addData(b2); q.processAllAvailable() } finally q.stop()
        spark.table(name).select("da", "db").distinct()
          .as[(Long, Long)].collect().toSet
      } finally {
        prev match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
      }
    }
    val default = runWith(None, "rocks_default")
    val rocks = runWith(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      "rocks_rocksdb")
    assert(rocks == default, s"RocksDB store changed verdicts: " +
      s"extra=${(rocks diff default).take(3)} missing=${(default diff rocks).take(3)}")
    assert(default.nonEmpty, "expected near-dup pairs in the corpus")
  }

  test("TTL evicts idle buckets: re-admission semantics + bounded state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import scala.concurrent.duration._
    val a1 = DocEvent(1, "alpha beta gamma delta epsilon zeta")
    val a2 = DocEvent(2, a1.text) // exact near-dup of a1
    val a3 = DocEvent(3, a1.text)
    val x  = DocEvent(9, "omicron sigma tau upsilon phi chi")

    // no-TTL control first: every dup pair spans the idle gap
    {
      val ms = MemoryStream[DocEvent]
      val q = DedupStream.nearDupPairs(ms.toDS())
        .writeStream.format("memory").queryName("ttl_none")
        .outputMode("append").start()
      try {
        Seq(Seq(a1), Seq(x), Seq(a2), Seq(a3)).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
      } finally q.stop()
      val noTtl = spark.table("ttl_none").select("da", "db")
        .as[(Long, Long)].collect().toSet
      assert(noTtl.contains((1L, 2L)) && noTtl.contains((2L, 3L)),
        s"without TTL all dup pairs must surface: $noTtl")
    }

    // TTL run. With ProcessingTimeTimeout registered the engine keeps
    // constructing timeout-check batches, so processAllAvailable() never
    // settles — drive this query with a fixed trigger and bounded polls
    // instead (the same way production monitors it).
    val ms = MemoryStream[DocEvent]
    val q = DedupStream.nearDupPairs(ms.toDS(), ttl = Some(1.second))
      .writeStream.format("memory").queryName("ttl_on")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .outputMode("append").start()
    def pollUntil(deadlineMs: Long)(cond: => Boolean): Boolean = {
      val end = System.currentTimeMillis() + deadlineMs
      while (!cond && System.currentTimeMillis() < end) Thread.sleep(100)
      cond
    }
    try {
      ms.addData(Seq(a1))
      assert(pollUntil(20000)(q.recentProgress.exists(_.numInputRows > 0)),
        "a1 batch never processed")
      // idle past the TTL: timeout-check batches evict a1's buckets
      Thread.sleep(2500)
      ms.addData(Seq(a2)); Thread.sleep(500)
      ms.addData(Seq(a3))
      // a2 re-seeded the evicted bucket, so (2,3) must surface;
      // (1,2)/(1,3) must NOT (doc 1's state was TTL-dropped)
      assert(pollUntil(20000)(
        spark.table("ttl_on").count() >= 1),
        "post-eviction dup pair never emitted")
      val withTtl = spark.table("ttl_on").select("da", "db")
        .as[(Long, Long)].collect().toSet
      assert(!withTtl.exists { case (da, _) => da == 1L },
        s"TTL-evicted doc must not pair: $withTtl")
      assert(withTtl.contains((2L, 3L)),
        s"re-seeded state must catch post-eviction dups: $withTtl")
      // state is bounded by recent arrivals (a2/a3's buckets), not by
      // all-time distinct content: doc 1's 4 rows are gone
      assert(pollUntil(20000) {
        val rows = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        rows.exists(n => n > 0 && n <= 4)
      }, s"TTL state not bounded: ${Option(q.lastProgress)
        .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)} rows")
    } finally q.stop()
  }

  test("TTL scope: untouched history-seeded buckets persist past the TTL") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import scala.concurrent.duration._
    // the documented contract: ttl bounds stream-touched state only;
    // seeded history is the authoritative dedup base and must not
    // idle-evict (Spark arms per-key timeouts only when the update
    // function runs for the key — and that is the semantics we WANT)
    val h1 = DocEvent(1, "alpha beta gamma delta epsilon zeta")
    val x = DocEvent(9, "omicron sigma tau upsilon phi chi")
    val dup = DocEvent(21, h1.text)
    val ms = MemoryStream[DocEvent]
    val q = DedupStream.nearDupPairsWithHistory(
        ms.toDS(), Seq(h1).toDS(), ttl = Some(1.second))
      .writeStream.format("memory").queryName("ttl_hist")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .outputMode("append").start()
    def pollUntil(deadlineMs: Long)(cond: => Boolean): Boolean = {
      val end = System.currentTimeMillis() + deadlineMs
      while (!cond && System.currentTimeMillis() < end) Thread.sleep(100)
      cond
    }
    try {
      // traffic to an UNRELATED bucket keeps batches flowing while h1's
      // seeded bucket stays untouched across the TTL horizon
      ms.addData(Seq(x))
      assert(pollUntil(20000)(q.recentProgress.exists(_.numInputRows > 0)),
        "x batch never processed")
      Thread.sleep(2500) // well past ttl with h1's bucket idle
      ms.addData(Seq(dup))
      assert(pollUntil(20000)(spark.table("ttl_hist").count() >= 1),
        "seeded history bucket was evicted while idle — the documented " +
          "TTL scope (stream-touched state only) is broken")
      val pairs = spark.table("ttl_hist").select("da", "db")
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 21L)), s"history pair missing: $pairs")
    } finally q.stop()
  }

  test("bucket-cap overflow is counted, not silent") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = (1L to 3L).map(i =>
      DocEvent(i, "kappa lambda mu nu xi omicron pi rho"))
    val acc = DedupStream.bucketOverflows(spark.sparkContext)
    acc.reset()
    val ms = MemoryStream[DocEvent]
    val q = DedupStream.nearDupPairs(ms.toDS(), maxBucket = 1)
      .writeStream.format("memory").queryName("overflow_out")
      .outputMode("append").start()
    try { ms.addData(docs); q.processAllAvailable() } finally q.stop()
    // capacity 1: doc 1 seeds all 4 band buckets; docs 2 and 3 are
    // dropped from all 4 — 8 overflow increments, zero emitted pairs,
    // and the counter is the only signal distinguishing that from a
    // genuinely clean stream
    assert(spark.table("overflow_out").count() == 0)
    assert(acc.value == 8L, s"expected 8 overflow drops, got ${acc.value}")
  }

  test("streaming keep-best state converges to the batch per-group keeper") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.expressions.Window
    // batch reference: the keep-best window policy (max uniq_ratio, ties
    // to lowest doc_id) over exact-fingerprint groups
    val ref = Tables.documents(spark, sf)
      .withColumn("fp", md5(lower(col("text")).cast("binary")))
      .withColumn("words", split(col("text"), " "))
      .withColumn("uniq_ratio", round(
        size(array_distinct(col("words"))) / size(col("words")).cast("double"), 6))
      .withColumn("keep_id", first("doc_id").over(
        Window.partitionBy("fp").orderBy(col("uniq_ratio").desc, col("doc_id"))))
      .select("doc_id", "keep_id")
      .as[(Long, Long)].collect().toMap

    val ms = MemoryStream[DocEvent]
    val q = DedupStream.keepBestDecisions(ms.toDS())
      .writeStream.format("memory").queryName("keepbest_out")
      .outputMode("append").start()
    val (b1, b2) = corpus.splitAt(corpus.length / 2)
    try {
      // replay the corpus (worst-case order for a streaming keeper:
      // reversed, so better copies often arrive after worse ones)
      ms.addData(b1.reverse); q.processAllAvailable()
      ms.addData(b2.reverse); q.processAllAvailable()
      // probe wave: redelivery re-emits the CURRENT verdict — the
      // supported state readout; after full replay it must equal the
      // batch keeper for every document
      ms.addData(corpus); q.processAllAvailable()
    } finally q.stop()
    val probes = spark.table("keepbest_out").as[KeepBestDecision].collect()
      .groupBy(_.doc_id).map { case (id, rows) =>
        // the probe row carries the final keeper; earlier rows may hold
        // keeper-so-far verdicts — final state wins, which redelivery
        // surfaces as the LAST emission. All probe-wave rows agree, so
        // take any row whose keep_id matches ref or fall back to set.
        id -> rows.map(_.keep_id).toSet
      }
    corpus.foreach { d =>
      val exp = ref(d.doc_id)
      assert(probes(d.doc_id).contains(exp),
        s"doc ${d.doc_id}: stream never reached batch keeper $exp " +
          s"(saw ${probes(d.doc_id)})")
    }
  }

  test("keep-best with history bootstrap: history keeper holds, better batch copy takes over") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // history: id 1 high-quality, id 2 low-quality ("a a" uniq 0.5).
    // Case variants share the lowercase fingerprint but differ in
    // uniq_ratio — the only way an exact-dup group has quality spread.
    val history = Seq(
      DocEvent(1, "w x y z"), // uniq 1.0
      DocEvent(2, "a a")      // uniq 0.5
    ).toDS()
    val ms = MemoryStream[DocEvent]
    val q = DedupStream.keepBestDecisionsWithHistory(ms.toDS(), history)
      .writeStream.format("memory").queryName("kb_hist").start()
    try {
      ms.addData(
        DocEvent(10, "w x y z"), // dup of 1, tie on quality -> 1 keeps
        DocEvent(12, "a A"),     // dup of 2's fp, uniq 1.0 -> takes over
        DocEvent(13, "fresh doc here")) // new group, keeper itself
      q.processAllAvailable()
      val got = spark.table("kb_hist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
      assert(got == Set(
        (10L, 1L, false),  // history keeper 1 holds against the tie
        (12L, 12L, true),  // better copy displaces history keeper 2
        (13L, 13L, true)), s"got $got")
    } finally q.stop()
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
