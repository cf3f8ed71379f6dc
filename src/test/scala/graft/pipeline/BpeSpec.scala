package graft.pipeline

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d_text_tokens_bpe — the trained-merge-table token counter: the
  * reconstruction law, the replace-pass semantics the contract documents,
  * and training determinism. The DuckDB training replay is pinned by the
  * catalog differential (the oracle re-trains in SQL). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("reconstruction law: tokens reassemble the normalized text exactly") {
    val rules = TextAnalysis.bpeRules(spark, sf)
    assert(rules.size == TextAnalysis.BPE_MERGES)
    assert(!rules.exists(_._1 == "~"), "fixture has ample pairs: no sentinel")
    val enc = rules.foldLeft("u") { case (e, (p1, p2)) =>
      s"replace($e, ' $p1 $p2 ', ' $p1$p2 ')"
    }
    val rows = TextAnalysis.bpeInit(spark, sf)
      .withColumn("u0", col("u"))
      .withColumn("u", expr(enc))
      .select(col("doc_id"), col("u0"), col("u")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val units0 = r.getString(1).trim.split(" ").filter(x => x.nonEmpty)
      val toks = r.getString(2).trim.split(" ").filter(x => x.nonEmpty)
      // (a) concatenation invariance: merging never changes the text
      assert(toks.mkString("") == units0.mkString(""),
        s"doc ${r.getLong(0)}: tokens must reassemble the unit stream")
      // (b) each merge welds exactly two units into one
      val merges = units0.length - toks.length
      assert(merges >= 0 && toks.count(_ != "|") ==
        units0.count(_ != "|") - merges,
        s"doc ${r.getLong(0)}: n_tokens must drop by exactly the merges")
      // (c) word separators are never merged away
      assert(toks.count(_ == "|") == units0.count(_ == "|"))
    }
    // the table genuinely compresses: the corpus has repeated char pairs
    val totalMerged = rows.map(r => r.getString(1).trim.split(" ").length -
      r.getString(2).trim.split(" ").length).sum
    assert(totalMerged > 0, "training should find at least one real merge")
  }

  test("replace-pass semantics: rescan-free left-to-right, both engines' reading") {
    import spark.implicits._
    // the documented uniform-run case: the pass consumes the shared
    // delimiter, grouping ' l l l l l ' as (1,2)+(4,5) — same COUNT as
    // greedy-with-rescan, and (verified) the same string DuckDB produces
    val got = Seq(" l l l l l ").toDF("u")
      .select(expr("replace(u, ' l l ', ' ll ')")).head.getString(0)
    assert(got == " ll l ll ", s"got '$got'")
  }

  test("sampled training reproduces full-corpus rules when the sample covers the corpus") {
    import spark.implicits._
    // the 100 TB path's law: if every text appears once in the md5-digit
    // sample and R times in the full corpus (uniform replication), every
    // adjacent-pair count scales by exactly R at EVERY merge iteration —
    // the (count DESC, p1, p2) argmax chain, ties included, is invariant
    // under uniform scaling, so the sampled table IS the full table.
    def hex1(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "%02x".format(md(0)).substring(0, 1)
    }
    val texts = Seq("the cat sat on the mat", "the dog ate the cod",
      "a banana and a bandana", "codec codec codec",
      "sphinx of black quartz judge my vow", "zebras graze at dawn")
    // per text: ONE doc_id hashing into the '2' sample + two outside it
    var nextId = 0L
    def take(p: String => Boolean): Long = {
      while (!p(hex1(nextId))) nextId += 1
      val id = nextId; nextId += 1; id
    }
    val rows = texts.flatMap { t =>
      Seq((take(_ == "2"), t), (take(_ != "2"), t), (take(_ != "2"), t))
    }
    val dir = java.nio.file.Files.createTempDirectory("bpe_sample").toString
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val full = TextAnalysis.bpeRulesStored(spark, dir)
    val sampled = TextAnalysis.bpeRulesSampledStored(spark, dir, Set("2"))
    assert(sampled == full,
      s"uniform coverage must reproduce the table: $sampled vs $full")
    assert(!full.exists(_._1 == "~"), "the planted corpus has real pairs")
    // the stored sampled table round-trips (second read hits the marker)
    assert(TextAnalysis.bpeRulesSampledStored(spark, dir, Set("2")) == full)
  }

  test("training is deterministic and frequency-ordered; the store round-trips") {
    val r1 = TextAnalysis.bpeRules(spark, sf)
    val r2 = TextAnalysis.bpeRules(spark, sf)
    assert(r1 == r2, "two trainings over the same corpus must agree")
    // the stored table (what the catalog key reads) == a fresh training,
    // rank order preserved
    assert(TextAnalysis.bpeRulesStored(spark, sf) == r1)
    // the first rule is the corpus's most frequent adjacent char pair
    val top = TextAnalysis.bpeInit(spark, sf)
      .select(explode(expr(
        """arrays_zip(slice(split(trim(u), ' '), 1, size(split(trim(u), ' ')) - 1),
                      slice(split(trim(u), ' '), 2, size(split(trim(u), ' ')) - 1))"""))
        .as("p"))
      .select(col("p.0").as("p1"), col("p.1").as("p2"))
      .filter(col("p1") =!= "|" && col("p2") =!= "|")
      .groupBy("p1", "p2").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("p1"), col("p2")).head
    assert(r1.head == ((top.getString(0), top.getString(1))))
  }
}
