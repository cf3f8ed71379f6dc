package graft.pipeline

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-advance contract (`Backbone.advance`): maintaining the
  * stored backbone with a new batch must (a) reproduce the full-rebuild
  * cluster labels bit-for-bit and (b) never re-scan history text — the
  * two properties that make nightly maintenance O(|batch|) instead of
  * O(|corpus|) at 100 TB.
  */
class BackboneAdvanceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("advanced labels equal the full rebuild bit-for-bit") {
    val full = Backbone.labels(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val incr = Backbone.advance(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.nonEmpty, "fixture regression: full rebuild found no clusters")
    assert(incr == full,
      s"incremental advance diverged from full rebuild:\n" +
        s"  only-incr: ${(incr -- full).toSeq.sorted.take(10)}\n" +
        s"  only-full: ${(full -- incr).toSeq.sorted.take(10)}")
  }

  test("stored history pairs + new-edge union equal the full pair table") {
    val split = TextDedup.deltaSplit(spark, sf)
    val h = Backbone.history(spark, sf, split)
    val histPairs = h.pairs
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullPairs = Backbone.pairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every stored history pair is a full pair, and every full pair
    // missing from history has at least one batch-side endpoint — i.e. a
    // history×history candidate can never newly arise during advance
    assert(histPairs.subsetOf(fullPairs))
    val newOnes = fullPairs -- histPairs
    assert(newOnes.forall { case (a, b) => a >= split || b >= split },
      s"pair with both endpoints in history absent from stored table: " +
        s"${newOnes.filter { case (a, b) => a < split && b < split }.take(5)}")
  }

  test("advanceAndStore: committed tables == a fresh full-corpus history build") {
    val n = Backbone.corpusCount(spark, sf)
    val stored = Backbone.advanceAndStore(spark, sf)
    val fresh = Backbone.history(spark, sf, n) // split = whole corpus

    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def twoLongs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def keepersOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    def bandsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // shingle-set rows: collect_set order is nondeterministic — compare as sets
    def setRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        (r.getLong(r.fieldIndex("doc_id")),
          r.getSeq[String](r.fieldIndex("bgs")).toSet)
      }.toSet

    assert(keepersOf(stored.keepers) == keepersOf(fresh.keepers), "keepers")
    assert(bandsOf(stored.bands) == bandsOf(fresh.bands), "bands")
    assert(setRows(stored.sets) == setRows(fresh.sets), "sets")
    assert(pairsOf(stored.pairs) == pairsOf(fresh.pairs), "pairs")
    assert(twoLongs(stored.labels) == twoLongs(fresh.labels), "labels")
  }

  test("two-day chain: advance from COMMITTED state ends at the full rebuild") {
    // day 1: history = first third, batch = second third, COMMIT;
    // day 2: history = day 1's committed tables (no fresh build), batch =
    // final third. The end state's labels must equal the one-shot rebuild
    // — the induction step of the daily loop run for real.
    val n = Backbone.corpusCount(spark, sf)
    val (t1, t2) = (n / 3, 2 * n / 3)
    val day1 = Backbone.advanceAndStore(spark, sf, t1, batchEnd = t2)
    val day2 = Backbone.advanceAndStore(spark, sf, t2,
      histOverride = Some(day1))
    val chained = day2.labels
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Backbone.labels(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(chained == full,
      s"two-day chain diverged from rebuild: " +
        s"only-chain ${(chained -- full).toSeq.sorted.take(5)}, " +
        s"only-full ${(full -- chained).toSeq.sorted.take(5)}")
  }

  test("advance == rebuild on randomized corpora, splits cutting through dup families") {
    import spark.implicits._
    val rnd = new scala.util.Random(1107)
    val vocab = (0 until 20).map(i => s"w$i")
    def doc(): String =
      Seq.fill(10 + rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def mutate(t: String): String = {
      val w = t.split(" ")
      w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(vocab.size))
      w.mkString(" ")
    }
    (0 until 2).foreach { c =>
      // ~10 families of exact + near copies, ids SHUFFLED so every split
      // point cuts through families (cross edges + batch-new clusters)
      val texts = scala.collection.mutable.Buffer[String]()
      (0 until 10).foreach { _ =>
        val base = doc()
        texts += base
        (0 until 1 + rnd.nextInt(2)).foreach(_ => texts += base)     // exact
        (0 until 1 + rnd.nextInt(2)).foreach(_ => texts += mutate(base)) // near
      }
      (0 until 30).foreach(_ => texts += doc()) // background singletons
      val shuffled = rnd.shuffle(texts.toSeq).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_adv_prop$c").toString
      shuffled.toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val full = Backbone.labels(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(full.nonEmpty, s"corpus $c: planted families produced no clusters")
      val n = shuffled.size
      Seq(n / 4, n / 2, 3 * n / 4).foreach { split =>
        val (adv, caches) = Backbone.advancePlan(spark, dir, split.toLong)
        val incr = adv.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        caches.foreach(_.unpersist())
        assert(incr == full,
          s"corpus $c split $split diverged: " +
            s"only-incr ${(incr -- full).toSeq.sorted.take(5)}, " +
            s"only-full ${(full -- incr).toSeq.sorted.take(5)}")
      }
    }
  }

  test("advance rescans no document text: batch signatures come from the store") {
    // since the batchSignature store landed, the advance plan reads
    // parquet signature tables on BOTH sides — the only documents scan
    // (batch-filtered, pushed) happens once inside the store's build
    val (advanced, caches) = Backbone.advancePlan(spark, sf)
    try {
      val p = advanced.queryExecution.executedPlan.toString
      assert(!p.contains("documents.parquet"),
        s"advance must not rescan document text:\n$p")
    } finally caches.foreach(_.unpersist())
  }

  test("batch signature store: tables cover exactly the batch, signed like the plan") {
    val split = TextDedup.deltaSplit(spark, sf)
    val bt = Backbone.batchSignature(spark, sf, split)
    val batch = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= split)
    val nBatch = batch.count()
    assert(bt.fps.count() == nBatch)
    assert(bt.sets.count() == nBatch)
    // 4 bands per doc
    assert(bt.bands.count() == 4 * nBatch)
    // stored bands == a fresh signature-plan evaluation, bit for bit
    val sp = TextDedup.signaturePlan(batch, nBands = 4, rowsPerBand = 2)
    try {
      assert(bt.bands.except(sp.bands).isEmpty &&
        sp.bands.except(bt.bands).isEmpty,
        "stored batch bands diverge from a fresh signing")
    } finally sp.caches.foreach(_.unpersist())
  }

  test("corpus token is injective and data-versioned; warehouse state is reusable") {
    import spark.implicits._
    def writeCorpus(dir: String, texts: Seq[(Long, String)]): Unit =
      texts.toDF("doc_id", "text").withColumn("lang",
        org.apache.spark.sql.functions.lit("en"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val root = java.nio.file.Files.createTempDirectory("bb_tok").toString
    // two dirs whose SANITIZED names collide ('-' and '_' both map to '_')
    val dA = s"$root/my-corpus"; val dB = s"$root/my_corpus"
    writeCorpus(dA, Seq((1L, "alpha beta gamma")))
    writeCorpus(dB, Seq((9L, "delta epsilon zeta")))
    val fpA = Backbone.fingerprints(spark, dA).collect().map(_.getLong(0)).toSet
    val fpB = Backbone.fingerprints(spark, dB).collect().map(_.getLong(0)).toSet
    assert(fpA == Set(1L) && fpB == Set(9L),
      s"colliding sanitized dirs must not share a backbone subtree: $fpA / $fpB")

    // warehouse mode: an explicit dir is used AS-IS and the on-disk
    // marker lets a "new JVM" (memo reset) reuse the committed build
    val wh = java.nio.file.Files.createTempDirectory("bb_wh").toString
    val prev = sys.props.get("graft.backbone.dir")
    sys.props("graft.backbone.dir") = wh
    try {
      Backbone.fingerprints(spark, dA).count()
      val subtree = new java.io.File(wh).listFiles().filter(_.isDirectory)
      assert(subtree.nonEmpty, "warehouse root must hold the subtree directly (no per-JVM runId)")
      val fpsDir = subtree.flatMap(_.listFiles()).find(_.getName == "fps2").get
      val mtime0 = fpsDir.lastModified()
      Thread.sleep(20)
      Backbone.resetMemoForTest() // simulate the next night's JVM
      Backbone.fingerprints(spark, dA).count()
      assert(fpsDir.lastModified() == mtime0,
        "a marker-complete build must be REUSED, not rebuilt, after a JVM restart")
      // a data drop at the same path gets a FRESH subtree (new token)
      writeCorpus(dA, Seq((1L, "alpha beta gamma"), (2L, "eta theta iota")))
      val fpA2 = Backbone.fingerprints(spark, dA).collect().map(_.getLong(0)).toSet
      assert(fpA2 == Set(1L, 2L),
        s"data drop at the same path must re-derive, got $fpA2")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.backbone.dir") = v
        case None => sys.props -= "graft.backbone.dir"
      }
      Backbone.resetMemoForTest() // paths under the temp warehouse are dead
    }
  }
}
