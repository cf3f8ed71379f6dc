package graft.pipeline

import java.nio.file.Files

import graft.{Tables, TestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("write round-trip: stored manifest == manifest recomputed from the written shards") {
    val dir = Files.createTempDirectory("graft_shards").toString
    val docs = Tables.documents(spark, sf)
    Shards.write(docs, dir, hexChars = 1)

    val data = spark.read.parquet(s"$dir/data")
    assert(data.count() == docs.count(), "no docs lost or duplicated")
    // the written partition value matches the deterministic shard key
    assert(data.filter(col("shard_id") =!=
      substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1))
      .count() == 0)

    val stored = spark.read.parquet(s"$dir/manifest")
      .orderBy("shard_id").collect().map(_.toString)
    val recomputed = Shards
      .manifest(data.select("doc_id", "text", "lang", "source", "n_chars"), 1)
      .orderBy("shard_id").collect().map(_.toString)
    assert(stored.sameElements(recomputed),
      "manifest must describe exactly what was written")
  }

  test("delta manifest: added/removed reconcile with the membership diff") {
    val dm = Shards.deltaManifest(spark, sf).collect()
    val keptNow = TextDedup.curationDecisions(spark, sf)
      .filter(col("decision") === "kept").count()
    val keptPrev = TextDedup.prevDecisions(spark, sf)
      .filter(col("decision_prev") === "kept").count()
    assert(dm.map(_.getAs[Long]("n_docs")).sum == keptNow,
      "manifest doc totals must cover exactly the kept set")
    assert(dm.map(_.getAs[Long]("n_added")).sum -
      dm.map(_.getAs[Long]("n_removed")).sum == keptNow - keptPrev,
      "per-shard adds/removes must reconcile with the version-level diff")
    dm.foreach { r =>
      val changed = r.getAs[Int]("changed")
      val delta = r.getAs[Long]("n_added") + r.getAs[Long]("n_removed")
      assert((changed == 1) == (delta > 0),
        s"shard ${r.getAs[String]("shard_id")}: changed flag out of sync")
    }
  }

  test("delta manifest: unchanged shards certify bit-equal to the previous manifest") {
    import spark.implicits._
    // Planted corpus, 16 docs → deltaSplit = 8 (history 0-7, batch
    // 8-15). doc 9 has the same DISTINCT bigram set as doc 1 (identical
    // minhash signatures → the band collision is guaranteed, J = 1.0)
    // but a higher uniq_ratio, so it steals doc 1's keeper slot:
    // shard(1) loses a doc, shard(9) gains one. Every other batch doc
    // is an exact dup of a history doc — dropped on arrival, so no
    // other shard's KEPT membership moves and those shards must certify
    // unchanged, bit-equal to the previous-version manifest.
    val hist = Seq(
      0L -> "alpine basalt cedar dune ember",
      1L -> "x y x y x", // prev keeper of the {x,y} cluster (ratio 0.4)
      2L -> "fjord grove heath inlet juniper",
      3L -> "karst loess mesa nadir oasis",
      4L -> "prairie quartz ridge summit tarn",
      5L -> "umber vale willow xenon yarrow",
      6L -> "atoll bayou cove delta estuary",
      7L -> "fen gulch hollow isthmus knoll")
    val batch = Seq(
      8L -> hist(0)._2, 10L -> hist(2)._2, 11L -> hist(3)._2,
      12L -> hist(4)._2, 13L -> hist(5)._2, 14L -> hist(6)._2,
      15L -> hist(7)._2, // exact dups: dropped, membership untouched
      9L -> "x y x y") // same bigram set as 1, ratio 0.5: steals keeper
    val dir = Files.createTempDirectory("graft_shard_delta").toString
    (hist ++ batch).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val dm = Shards.deltaManifest(spark, dir).collect()
      .map(r => r.getAs[String]("shard_id") -> r).toMap
    def shardOf(id: Long) = Shards
      .withShard(Seq(id).toDF("doc_id"), 1)
      .select("shard_id").head().getString(0)
    assert(dm(shardOf(9L)).getAs[Long]("n_added") >= 1L, "keeper theft adds")
    assert(dm(shardOf(1L)).getAs[Long]("n_removed") >= 1L,
      "the demoted prev keeper must surface as a removal")

    // previous-version manifest, derived independently of deltaManifest
    val prevKept = TextDedup.prevDecisions(spark, dir)
      .filter(col("decision_prev") === "kept").select("doc_id")
    val prevManifest = Shards.manifest(
        Tables.documents(spark, dir).join(prevKept, Seq("doc_id")), 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val unchanged = dm.filter(_._2.getAs[Int]("changed") == 0)
      .filter { case (sid, _) =>
        dm(sid).getAs[Long]("n_docs") > 0 || prevManifest.contains(sid) }
    assert(unchanged.nonEmpty, "the plant must leave certified shards")
    unchanged.foreach { case (sid, r) =>
      val p = prevManifest.getOrElse(sid,
        fail(s"shard $sid certified unchanged but absent previously"))
      Seq("n_docs", "n_tokens", "n_chars").foreach(c =>
        assert(r.getAs[Long](c) == p.getAs[Long](c), s"$sid.$c drifted"))
      Seq("min_fp", "max_fp").foreach(c =>
        assert(r.getAs[String](c) == p.getAs[String](c), s"$sid.$c drifted"))
    }
  }

  test("delta manifest laws hold on randomized corpora (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815)
    val vocab = (0 until 400).map(i => s"w$i")
    def doc() = (0 until 8 + rnd.nextInt(12))
      .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def mutate(t: String) = {
      val w = t.split(" "); w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(vocab.size))
      w.mkString(" ")
    }
    (0 until 2).foreach { c =>
      // exact + near families with SHUFFLED ids so the half split cuts
      // through them (keeper thefts, bridged clusters, dropped arrivals)
      val texts = scala.collection.mutable.Buffer[String]()
      (0 until 8).foreach { _ =>
        val base = doc()
        texts += base
        (0 until 1 + rnd.nextInt(2)).foreach(_ => texts += base)
        (0 until 1 + rnd.nextInt(2)).foreach(_ => texts += mutate(base))
      }
      (0 until 24).foreach(_ => texts += doc())
      val dir = Files.createTempDirectory(s"graft_sd_prop$c").toString
      rnd.shuffle(texts.toSeq).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val dm = Shards.deltaManifest(spark, dir).collect()
      val keptNow = TextDedup.curationDecisions(spark, dir)
        .filter(col("decision") === "kept").count()
      val keptPrev = TextDedup.prevDecisions(spark, dir)
        .filter(col("decision_prev") === "kept").count()
      assert(dm.map(_.getAs[Long]("n_docs")).sum == keptNow, s"corpus $c: doc cover")
      assert(dm.map(_.getAs[Long]("n_added")).sum -
        dm.map(_.getAs[Long]("n_removed")).sum == keptNow - keptPrev,
        s"corpus $c: reconciliation")
      dm.foreach { r =>
        assert((r.getAs[Int]("changed") == 1) ==
          (r.getAs[Long]("n_added") + r.getAs[Long]("n_removed") > 0),
          s"corpus $c shard ${r.getAs[String]("shard_id")}: changed flag")
      }
      val prevKept = TextDedup.prevDecisions(spark, dir)
        .filter(col("decision_prev") === "kept").select("doc_id")
      val prevManifest = Shards.manifest(
          Tables.documents(spark, dir).join(prevKept, Seq("doc_id")), 1)
        .collect().map(r => r.getString(0) -> r).toMap
      dm.filter(r => r.getAs[Int]("changed") == 0 &&
          (r.getAs[Long]("n_docs") > 0 ||
            prevManifest.contains(r.getAs[String]("shard_id"))))
        .foreach { r =>
          val sid = r.getAs[String]("shard_id")
          val p = prevManifest.getOrElse(sid,
            fail(s"corpus $c: $sid certified unchanged but absent previously"))
          Seq("n_docs", "n_tokens", "n_chars").foreach(cn =>
            assert(r.getAs[Long](cn) == p.getAs[Long](cn), s"corpus $c $sid.$cn"))
          Seq("min_fp", "max_fp").foreach(cn =>
            assert(r.getAs[String](cn) == p.getAs[String](cn), s"corpus $c $sid.$cn"))
        }
    }
  }

  test("each shard is one doc_id-sorted file; assignment is engine-reproducible") {
    val dir = Files.createTempDirectory("graft_shards2").toString
    Shards.write(Tables.documents(spark, sf), dir, hexChars = 1)
    val shardDirs = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.startsWith("shard_id=")).sortBy(_.getName)
    assert(shardDirs.length == 16, "one directory per hex shard")
    shardDirs.foreach { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"${sd.getName}: hash-partitioned write → exactly one file per shard")
      val ids = spark.read.parquet(sd.toString)
        .select("doc_id").collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"${sd.getName} not doc_id-sorted")
    }
  }
}
