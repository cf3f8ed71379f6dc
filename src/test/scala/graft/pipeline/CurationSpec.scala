package graft.pipeline

import graft.{Tables, TestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("strat sample: per-stratum quota, hash-deterministic across runs") {
    val s1 = Curation.queries("d_strat_sample")(spark, sf).collect()
    val perLang = s1.groupBy(_.getString(0))
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(perLang.size == langs)
    perLang.values.foreach { rs =>
      assert(rs.length <= 5)
      assert(rs.map(_.getInt(2)).sorted.sameElements(1 to rs.length))
    }
    val s2 = Curation.queries("d_strat_sample")(spark, sf).collect()
    assert(s1.map(_.toString).sameElements(s2.map(_.toString)))
  }

  test("decontam: flagged docs are train-split and truly share a 5-gram") {
    val flagged = Curation.queries("d_decontam")(spark, sf).collect()
    assert(flagged.nonEmpty, "planted near-dups straddle the split")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("t"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1).as("h"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    def grams5(t: String): Set[String] =
      t.split(" ").sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    val benchGrams = docs.values.collect { case (t, "1") => grams5(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    flagged.foreach { r =>
      val (t, h) = docs(r.getLong(0))
      assert(h != "0" && h != "1", "flagged doc must be train-split")
      val shared = grams5(t).intersect(benchGrams)
      assert(shared.size == r.getLong(1), s"doc ${r.getLong(0)} n_shared mismatch")
    }
  }

  test("decontam bloom path: bit-for-bit agreement with the exact join") {
    val exact = Curation.queries("d_decontam")(spark, sf).collect().map(_.toString)
    val bloom = Curation.queries("d_decontam_bloom")(spark, sf).collect().map(_.toString)
    assert(bloom.sameElements(exact),
      "the 2x24-bit seeded-pair sizing must be fp-free at test scale")
  }

  test("KM double-hashing fp floor is real; the seed pair kills it") {
    // Spark's sketch bloom probes bit_i = h1 + i*h2 mod m: when a probe's
    // h2 mod m degenerates, all hash functions land on few distinct bits
    // and the per-probe fp collapses to ~the fill ratio — a floor of
    // O(1/m) that NO bits/item sizing can push below. This pins (a) the
    // floor exists (single filter admits synthetic junk), and (b) two
    // filters with different xxhash64 seeds have independent degeneracies
    // (the conjunction admits none) — the d_decontam_bloom design.
    val bench = Tables.documents(spark, sf)
      .withColumn("h", substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1))
      .withColumn("w", split(lower(col("text")), " "))
      .filter(size(col("w")) >= 5).filter(col("h") === "1")
      .select(explode(expr(
        "transform(sequence(1, size(w) - 4), i -> array_join(slice(w, i, 5), ' '))"))
        .as("g"))
      .distinct()
    val (bf1, bf2) = Curation.bloomPair(bench)
    val probes = spark.range(2000000)
      .select(concat(lit("not-a-gram-"), col("id").cast("string")).as("g"))
    val p1 = Curation.bloomProbe(bf1, Curation.bloomSeed1)
    val p2 = Curation.bloomProbe(bf2, Curation.bloomSeed2)
    val single = probes.filter(p1).count()
    val conj = probes.filter(p1 && p2).count()
    assert(single > 0, s"fp floor should surface within 2M probes (got $single)")
    assert(conj == 0, s"seed-pair conjunction must be fp-free (got $conj)")
  }

  test("contaminationScore: per-row stateless form == the agg-based d_decontam") {
    val splitH = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
    val bench = Tables.documents(spark, sf)
      .withColumn("h", splitH)
      .withColumn("w", split(lower(col("text")), " "))
      .filter(size(col("w")) >= 5).filter(col("h") === "1")
      .select(explode(expr(
        "transform(sequence(1, size(w) - 4), i -> array_join(slice(w, i, 5), ' '))"))
        .as("g"))
      .distinct()
    val (bf1, bf2) = Curation.bloomPair(bench)
    val perRow = Tables.documents(spark, sf)
      .withColumn("h", splitH)
      .filter(!col("h").isin("0", "1"))
      .select(col("doc_id"),
        Curation.contaminationScore(col("text"), bf1, bf2).as("n_shared"))
      .filter(col("n_shared") > 0)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1).toLong))
    val agg = Curation.queries("d_decontam")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(perRow.sameElements(agg))
  }

  test("bloom pair persists and reloads byte-identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val bench = Seq("b1 b2 b3 b4 b5 b6", "c1 c2 c3 c4 c5").toDF("text")
      .withColumn("w", split(lower(col("text")), " "))
      .select(explode(expr(
        "transform(sequence(1, size(w) - 4), i -> array_join(slice(w, i, 5), ' '))"))
        .as("g")).distinct()
    val (f1, f2) = Curation.bloomPair(bench)
    Curation.writeBloomPair(spark, bench, dir)
    val (l1, l2) = Curation.readBloomPair(spark, dir)
    assert(java.util.Arrays.equals(f1, l1) && java.util.Arrays.equals(f2, l2),
      "stored filters must probe identically to freshly built ones")
    val score = Seq("x b1 b2 b3 b4 b5 y").toDF("text")
      .select(Curation.contaminationScore(col("text"), l1, l2).as("s"))
      .head.getInt(0)
    assert(score == 1)
  }

  test("contaminationScore runs stateless in a streaming append select") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_decontam_stream").toString
    val bench = Seq("e1 e2 e3 e4 e5 e6").toDF("text")
      .withColumn("w", split(lower(col("text")), " "))
      .select(explode(expr(
        "transform(sequence(1, size(w) - 4), i -> array_join(slice(w, i, 5), ' '))"))
        .as("g")).distinct()
    val (bf1, bf2) = Curation.bloomPair(bench)
    Seq((1L, "e1 e2 e3 e4 e5 x"),       // shares gram e1..e5
        (2L, "a b c d e f"),            // clean
        (3L, "e1 e2 e3 e4 e5 e6 y"))    // shares both bench grams
      .toDF("doc_id", "text").repartition(1).write.parquet(s"$dir/in")
    val q = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(s"$dir/in")
      .select(col("doc_id"),
        Curation.contaminationScore(col("text"), bf1, bf2).as("n_shared"))
      .writeStream.format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append") // stateless: append needs no watermark/state
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$dir/out")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.sameElements(Array((1L, 1), (2L, 0), (3L, 2))))
  }

  test("curriculum: phases token-balanced within one doc; quality monotone across phases") {
    import org.apache.spark.sql.functions._
    val cur = Curation.queries("d_curriculum")(spark, sf).collect()
    assert(cur.nonEmpty)
    val phases = cur.groupBy(_.getAs[Int]("phase"))
    assert(phases.keySet == (0 until 10).toSet
      || phases.keySet.subsetOf((0 until 10).toSet),
      s"phases out of range: ${phases.keySet}")
    // token-equal cut: a phase spans [k*tot/10, (k+1)*tot/10) in
    // cumulative-token space and each BOUNDARY lands within one doc of
    // its ideal, so two phase sums differ by at most one doc per edge
    val sums = phases.view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum)
    val maxDoc = cur.map(_.getAs[Long]("n_tokens")).max
    if (sums.size == 10)
      assert(sums.values.max - sums.values.min <= 2 * maxDoc,
        s"phase token sums unbalanced beyond the boundary granularity: " +
          s"${sums.toMap} (maxDoc $maxDoc)")
    // the curriculum property itself: a later phase never contains a
    // strictly better-quality doc than an earlier phase's worst
    val byPhase = phases.view.mapValues(_.map(_.getAs[Double]("quality")))
    (0 until 9).foreach { p =>
      for (a <- byPhase.get(p); b <- byPhase.get(p + 1))
        assert(a.min >= b.max - 1e-9,
          s"phase $p worst ${a.min} < phase ${p + 1} best ${b.max}")
    }
  }

  test("pii scrub: every synthetic PII token is redacted") {
    val rows = Curation.queries("d_pii_scrub")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getInt(1) == 1, "exactly the planted email")
      assert(r.getInt(2) == 1, "exactly the planted IPv4")
    }
    // independently recompute one scrub and confirm no digits survive
    val t = Tables.documents(spark, sf).filter(col("doc_id") === 7)
      .select(col("text")).head().getString(0)
    val s = s"$t contact-7@mail.example ip 10.0.7.7 id ${7 * 7919}"
    val scrub = s.replaceAll("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>")
      .replaceAll("(?:[0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>")
      .replaceAll("[0-9]+", "<NUM>")
    assert(!scrub.exists(_.isDigit))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(scrub.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = rows.find(_.getLong(0) == 7L).get.getString(3)
    assert(got == md, "scrub_md5 must equal an independent JVM-regex scrub")
  }

  test("repetition: dup fraction bounds and exact recount on a sample") {
    val rows = Curation.queries("d_repetition")(spark, sf).collect()
    rows.foreach { r =>
      val (n, u, f) = (r.getInt(1), r.getInt(2), r.getDouble(3))
      assert(u <= n && f >= 0.0 && f < 1.0)
      assert(math.abs(f - (1.0 - u.toDouble / n)) < 1e-6)
    }
    val planted = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("t")).limit(20).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    planted.foreach { d =>
      val bgs = d.getString(1).split(" ").sliding(2).map(_.mkString(" ")).toSeq
      val r = byId(d.getLong(0))
      assert(r.getInt(1) == bgs.length && r.getInt(2) == bgs.distinct.length)
    }
  }

  test("emb outlier: 3 per label, distances positive, centroid is argmin-ish") {
    val rows = Curation.queries("d_emb_outlier")(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf).select("label").distinct().count()
    assert(rows.length == labels * 3)
    rows.groupBy(_.getInt(1)).values.foreach { rs =>
      assert(rs.map(_.getInt(3)).sorted.sameElements(1 to 3))
      // outlier list is sorted by descending distance
      val ds = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
      ds.foreach(d => assert(d > 0))
    }
  }

  test("dedup cluster: consistent with pairs, canonical min keeper") {
    val pairs = TextDedup.queries("d_dedup_minhash")(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = TextDedup.queries("d_dedup_cluster")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(pairs.nonEmpty && clusters.nonEmpty)
    // membership = exactly the docs that appear in some pair
    assert(clusters.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // both endpoints of every near-dup pair land in the same cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
    }
    // cluster_id is the min member; cluster_size counts the members
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keySet.min == cid)
      members.values.foreach { case (_, sz) => assert(sz == members.size) }
    }
  }

  test("curation cascade: precedence, keep-best tie-break, null paths") {
    import spark.implicits._
    // Planted corpus:
    //   1,2  identical text (exact dups), near-dups of 3; 3 has a higher
    //        uniq_ratio than 1/2, so keep-best picks 3 — making 2 BOTH an
    //        exact dup and a near-dup non-keeper (must resolve drop_exact)
    //        and 1 a pure near-dup non-keeper.
    //   4    unclustered low-quality (uniq_ratio 0.2 < 0.3) -> drop_quality.
    //   5    unclustered clean -> kept.
    //   6,7  near-dups with EQUAL uniq_ratio -> tie-break keeps lowest id.
    val dir = java.nio.file.Files.createTempDirectory("curation_corpus").toString
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog today", "en"),
      (2L, "the quick brown fox jumps over the lazy dog today", "en"),
      (3L, "the quick brown fox jumps over a lazy dog today", "en"),
      (4L, "spam spam spam spam spam spam spam spam spam eggs", "en"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
      (6L, "red green blue yellow purple orange pink black white gray", "en"),
      (7L, "red green blue yellow purple orange pink black white silver", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // keep-best: clusters {1,2,3} (keeper 3: ratio 1.0 beats 0.9) and
    // {6,7} (ratio tie at 1.0 -> lowest doc_id 6); singletons keep
    // themselves with cluster_id = own id.
    val kb = TextDedup.queries("d_dedup_keep_best")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(kb.keySet == (1L to 7L).toSet)
    assert(kb(1L) == ((1L, 3L, 0)) && kb(2L) == ((1L, 3L, 0)) && kb(3L) == ((1L, 3L, 1)),
      s"cluster {1,2,3} must keep 3 (max uniq_ratio): $kb")
    assert(kb(6L) == ((6L, 6L, 1)) && kb(7L) == ((6L, 6L, 0)),
      s"equal-ratio tie must keep the lowest doc_id: $kb")
    assert(kb(4L) == ((4L, 4L, 1)) && kb(5L) == ((5L, 5L, 1)),
      s"singletons are their own cluster and keeper: $kb")

    val dec = TextDedup.queries("d_curation_apply")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec == Map(
      1L -> "drop_near_dup", // exact keeper of {1,2} but not cluster keeper
      2L -> "drop_exact",    // exact dup AND near-dup non-keeper: exact wins
      3L -> "kept",
      4L -> "drop_quality",  // unclustered low-quality null path
      5L -> "kept",
      6L -> "kept",
      7L -> "drop_near_dup"), s"cascade decisions wrong: $dec")
  }

  test("dedup cluster on a clean corpus returns empty, not NPE") {
    import spark.implicits._
    // Single-word docs produce zero bigrams -> zero minhash pairs -> the
    // label-propagation loop starts from an empty frame (regression: the
    // bare sum() signature read was NULL here and threw).
    val dir = java.nio.file.Files.createTempDirectory("clean_corpus").toString
    Seq((1L, "alpha", "en"), (2L, "beta", "en"), (3L, "gamma", "de"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextDedup.queries("d_dedup_cluster")(spark, dir)
    assert(out.columns.toSeq == Seq("doc_id", "cluster_id", "cluster_size"))
    assert(out.count() == 0)
  }

  test("token budget: distributed CDF equals the brute prefix sum; budget is tight") {
    val rows = Curation.queries("d_token_budget")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
    assert(rows.nonEmpty)
    // brute: sort by (quality desc, doc_id), running token sum
    val ranked = rows.sortBy { case (id, _, q, _, _) => (-q, id) }
    var cum = 0L
    ranked.foreach { case (id, n, _, gotCum, _) =>
      cum += n
      assert(gotCum == cum, s"doc $id cum mismatch: $gotCum vs $cum")
    }
    val tot = rows.map(_._2).sum
    rows.foreach { case (id, _, _, c, sel) =>
      assert(sel == (if (c * 2 <= tot) 1 else 0), s"doc $id selected flag")
    }
    // the budget is tight: selected tokens <= tot/2 < selected + next doc
    val sel = ranked.filter(_._5 == 1)
    assert(sel.nonEmpty && sel.length < rows.length)
    val selTokens = sel.map(_._2).sum
    assert(selTokens * 2 <= tot)
    val firstDropped = ranked(sel.length)
    assert((selTokens + firstDropped._2) * 2 > tot,
      "first doc past the cut must overflow the budget")
    // selection is a prefix of the quality ranking
    assert(ranked.takeWhile(_._5 == 1).length == sel.length,
      "selected set must be a rank prefix")
  }

  test("bpe token budget: n_tokens IS the trained-BPE count; CDF equals brute prefix sum") {
    // the point of the key: ONE token counter across the catalog — the
    // budget's n_tokens must equal d_text_tokens_bpe's per doc, not a
    // second BPE implementation that could drift
    val bpe = TextAnalysis.queries("d_text_tokens_bpe")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Curation.queries("d_token_budget_bpe")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
    assert(rows.nonEmpty && rows.length == bpe.size)
    rows.foreach { case (id, n, _, _, _) =>
      assert(n == bpe(id), s"doc $id n_tokens must come from the stored merge table")
    }
    // subword precision actually differs from the whitespace estimate
    val ws = Curation.queries("d_token_budget")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.exists { case (id, n, _, _, _) => ws(id) != n },
      "BPE counts should not be identical to the estimate on a real corpus")
    val ranked = rows.sortBy { case (id, _, q, _, _) => (-q, id) }
    var cum = 0L
    ranked.foreach { case (id, n, _, gotCum, _) =>
      cum += n
      assert(gotCum == cum, s"doc $id cum mismatch: $gotCum vs $cum")
    }
    val tot = rows.map(_._2).sum
    rows.foreach { case (id, _, _, c, sel) =>
      assert(sel == (if (c * 2 <= tot) 1 else 0), s"doc $id selected flag")
    }
  }

  test("bpe curriculum: same kept cascade as the estimate variant; phase law exact") {
    val est = Curation.queries("d_curriculum")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val cur = Curation.queries("d_curriculum_bpe")(spark, sf).collect()
    assert(cur.nonEmpty)
    assert(cur.map(_.getLong(0)).toSet == est,
      "BPE sizing must not change WHICH docs survive the cascade")
    val phases = cur.groupBy(_.getAs[Int]("phase"))
    assert(phases.keySet.subsetOf((0 until 10).toSet),
      s"phases out of range: ${phases.keySet}")
    // quality monotone across phases (the curriculum property)
    val byPhase = phases.view.mapValues(_.map(_.getAs[Double]("quality")))
    (0 until 9).foreach { p =>
      for (a <- byPhase.get(p); b <- byPhase.get(p + 1))
        assert(a.min >= b.max - 1e-9,
          s"phase $p worst ${a.min} < phase ${p + 1} best ${b.max}")
    }
    // exact phase law, including the cum>=1 clamp for zero-token docs
    val ranked = cur.map(r => (r.getLong(0), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("quality"), r.getAs[Long]("cum_tokens"),
        r.getAs[Int]("phase")))
      .sortBy { case (id, _, q, _, _) => (-q, id) }
    val tot = ranked.map(_._2).sum
    var cum = 0L
    ranked.foreach { case (id, n, _, gotCum, ph) =>
      cum += n
      assert(gotCum == cum, s"doc $id cum mismatch")
      assert(ph == (((math.max(cum, 1L) - 1L) * 10L) / tot).toInt,
        s"doc $id phase law")
    }
  }

  test("bpe curriculum: a zero-token doc lands in phase 0, not phase -1") {
    import spark.implicits._
    // '#####' normalizes to an empty unit stream -> BPE n_tokens == 0;
    // cum can be 0 for the best-quality doc and (cum-1)*10 div tot would
    // disagree in SIGN between Spark's truncating div and DuckDB's
    // flooring // — the clamp pins both to phase 0. Quality 1.0 (single
    // distinct word) ranks it first, so its cum IS the dangerous 0.
    val dir = java.nio.file.Files.createTempDirectory("bpe_zero").toString
    Seq((1L, "#####", "en", "web", 5L),
        (2L, "alpha beta alpha beta gamma", "en", "web", 27L),
        (3L, "delta delta delta epsilon zeta", "en", "web", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.queries("d_curriculum_bpe")(spark, dir).collect()
    val zero = out.find(_.getLong(0) == 1L)
    zero.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == 0L)
      assert(r.getAs[Int]("phase") == 0, "zero-token doc must clamp to phase 0")
    }
    out.foreach(r => assert(r.getAs[Int]("phase") >= 0))
  }

  test("mix apply: per-source copies hit floor(N*w) exactly; prefix is rank-deterministic") {
    import org.apache.spark.sql.functions.{col => c}
    val mix = Curation.queries("d_mix_apply")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(mix.nonEmpty)
    val weights = Curation.queries("d_domain_mix")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    val perSource = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = perSource.values.sum
    // law 1: source s contributes EXACTLY floor(total * w_s) copies
    val copies = mix.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    perSource.keys.foreach { s =>
      val target = math.floor(total * weights(s)).toLong
      assert(copies.getOrElse(s, 0L) == target,
        s"source $s: ${copies.getOrElse(s, 0L)} copies != target $target")
    }
    // law 2: within a source, extra (epoch+1) copies go to the md5-rank
    // prefix — n_copies is non-increasing in rank_in_source
    mix.groupBy(_._2).values.foreach { rows =>
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._4).sameElements(byRank.map(_._4).sorted.reverse),
        "copies must be non-increasing in rank")
      assert(byRank.map(_._4).toSet.size <= 2, "epochs differ by at most 1")
    }
    // law 3: an upweighted-small-source corpus really exercises the
    // epoch path somewhere OR every source downsamples — assert the
    // manifest is a strict mix: not every doc kept once
    assert(mix.exists(_._4 != 1L) || mix.length < total)
    // determinism
    val again = Curation.queries("d_mix_apply")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(mix.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("domain mix: shares and weights normalize; temperature flattens the mix") {
    val rows = Curation.queries("d_domain_mix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length >= 2, "documents must span several sources")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "token shares sum to 1")
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4, "mix weights sum to 1")
    // alpha < 1 flattens: below-average domains get upweighted, above-average
    // domains downweighted (share^0.7 crosses share at the normalization point)
    val byShare = rows.sortBy(_._4)
    assert(byShare.map(_._5).zip(byShare.map(_._4)).forall { case (w, s) => w > 0 && s > 0 })
    assert(byShare.head._5 >= byShare.head._4 - 1e-9,
      "smallest domain must not lose mass under temperature 0.7")
    assert(byShare.last._5 <= byShare.last._4 + 1e-9,
      "largest domain must not gain mass under temperature 0.7")
    // order by weight preserves order by share (monotone transform)
    assert(byShare.map(_._5).sameElements(byShare.map(_._5).sorted),
      "mix weight must be monotone in share")
  }
}
