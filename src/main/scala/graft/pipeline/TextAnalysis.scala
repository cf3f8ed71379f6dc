package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation over `documents`: quality
  * scoring, n-gram-heuristic language ID, token counting, and document
  * fingerprinting. Everything is per-row columnar work (codegen'd
  * built-ins + higher-order functions, no UDFs) — embarrassingly parallel
  * at any scale; the only shuffle is the fingerprint group.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  private val stopEn = Seq("the", "a", "and", "of", "to", "in", "is")
  // Marker sets for the n-gram/stopword language heuristic. The corpus is
  // English-ish tech text; de/fr rows exercise the tie/zero paths.
  private val stopDe = Seq("der", "die", "das", "und", "ist")
  private val stopFr = Seq("le", "la", "et", "est", "les")

  private def arrayLit(xs: Seq[String]) = array(xs.map(lit): _*)

  /** THE canonicalization chain (lowercase → non-alnum to space →
    * collapse runs → trim) — single definition shared by
    * `d_text_normalize` and the e2e pipeline's fingerprint stage: the
    * composed pipeline is only equivalent to the standalone operator
    * while both apply the byte-identical expression, so there is
    * deliberately one copy (the SQL oracles mirror it textually). */
  private[pipeline] def normCol: Column = trim(regexp_replace(
    regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))

  /** Number of BPE merges trained for `d_text_tokens_bpe` — small and
    * fixed so the DuckDB oracle can replay training as K chained CTEs. */
  private[pipeline] val BPE_MERGES = 10

  /** doc_id + the initial BPE unit string: ' c h a r s | o f | w o r d s '
    * — characters as units, '|' the word-separator unit, single-space
    * delimited with sentinel spaces at both ends (so every unit boundary
    * is ' x ', the anchor the replace passes key on). The normalization
    * is the shared [[normCol]] chain, whose output alphabet is [a-z0-9 ]
    * — the reserved '|' and '~' units can never occur as characters. */
  private[pipeline] def bpeInit(s: SparkSession, d: String): DataFrame =
    bpeUnits(Tables.documents(s, d))

  /** The unit construction over any (doc_id, text) frame — factored so
    * the sampled trainer below feeds a filtered corpus through the SAME
    * expression. */
  private def bpeUnits(docs: DataFrame): DataFrame =
    docs
      .withColumn("nt", normCol)
      .select(col("doc_id"), expr(
        """CASE WHEN nt = '' THEN ' ' ELSE
             ' ' || array_join(transform(split(nt, ' '),
               w -> array_join(regexp_extract_all(w, '[a-z0-9]', 0), ' ')),
               ' | ') || ' ' END""").as("u"))

  /** Train the merge table: BPE_MERGES iterations of corpus-wide
    * adjacent-pair counting + argmax + one replace pass (contract at the
    * d_text_tokens_bpe catalog entry). Driver-side loop; each collect is
    * exactly one rule row. localCheckpoint keeps iteration i's plan from
    * re-running passes 1..i-1. */
  private[pipeline] def bpeRules(s: SparkSession, d: String)
      : Seq[(String, String)] =
    bpeTrain(s, bpeInit(s, d))

  private def bpeTrain(s: SparkSession, init: DataFrame)
      : Seq[(String, String)] = {
    import s.implicits._
    val rules = Seq.newBuilder[(String, String)]
    var st = init.select("u").localCheckpoint(true)
    (1 to BPE_MERGES).foreach { _ =>
      val pairs = st.select(explode(expr(
        """arrays_zip(slice(split(trim(u), ' '), 1, size(split(trim(u), ' ')) - 1),
                      slice(split(trim(u), ' '), 2, size(split(trim(u), ' ')) - 1))"""))
          .as("p"))
        .select(col("p.0").as("p1"), col("p.1").as("p2"))
        .filter(col("p1") =!= "|" && col("p2") =!= "|" &&
          col("p1") =!= "" && col("p2") =!= "")
        .groupBy("p1", "p2").agg(count(lit(1)).as("c"))
        // sentinel: an exhausted corpus still yields a rule; '~' is
        // outside the normalized alphabet so its replace is a no-op
        .unionByName(Seq(("~", "~", -1L)).toDF("p1", "p2", "c"))
      val best = pairs.orderBy(col("c").desc, col("p1"), col("p2"))
        .limit(1).collect()(0)
      val (p1, p2) = (best.getString(0), best.getString(1))
      rules += ((p1, p2))
      st = st.withColumn("u",
        expr(s"replace(u, ' $p1 $p2 ', ' $p1$p2 ')")).localCheckpoint(true)
    }
    rules.result()
  }

  /** Stored merge table — train ONCE per corpus version, readers read
    * (the lmModelStore discipline; the production shape is one training
    * per curation run, N encoders — the iterative trainer's K sequential
    * jobs are a build cost, not a per-query cost). The table is
    * BPE_MERGES rows, so the read-back collect is metadata-scale. */
  private[pipeline] def bpeRulesStored(s: SparkSession, d: String)
      : Seq[(String, String)] = {
    val base = s"${Warehouse.versionDir(s, d, "documents.parquet")}/bpe"
    Warehouse.ensure(s, base) {
      import s.implicits._
      bpeRules(s, d).zipWithIndex
        .map { case ((p1, p2), i) => (i, p1, p2) }
        .toDF("rank", "p1", "p2")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/rules")
    }
    Warehouse.sidecarValue(s, s"rules:$base")(
      Warehouse.readParquet(s, s"$base/rules").orderBy("rank")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq)
  }

  /** The 100 TB training path, as code instead of a comment (r17 VERDICT
    * #7): train the merge table on the `d_sample_split`-style md5-prefix
    * DETERMINISTIC sample — documents whose sampling hash
    * (first hex digit of `md5(doc_id)`, the split key's exact
    * expression) falls in `digits` — instead of the full corpus. One
    * digit = a 1/16 sample; training cost drops proportionally while the
    * pair statistics (and hence the argmax chain) track the corpus,
    * exactly when the sample sees the corpus's pair distribution —
    * BpeSpec pins the law: a corpus whose texts the sample covers
    * uniformly trains the IDENTICAL merge table. Stored once per
    * (corpus version, sample) behind its own warehouse marker; encoding
    * still runs over the FULL corpus with whichever table the caller
    * picks. */
  private[pipeline] def bpeRulesSampledStored(s: SparkSession, d: String,
      digits: Set[String] = Set("2")): Seq[(String, String)] = {
    require(digits.nonEmpty && digits.forall(h =>
      h.length == 1 && "0123456789abcdef".contains(h)),
      s"sample digits must be single hex chars, got $digits")
    val tag = digits.toSeq.sorted.mkString
    val base =
      s"${Warehouse.versionDir(s, d, "documents.parquet")}/bpe_sampled_$tag"
    Warehouse.ensure(s, base) {
      import s.implicits._
      val sampled = Tables.documents(s, d).filter(
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
          .isin(digits.toSeq: _*))
      bpeTrain(s, bpeUnits(sampled)).zipWithIndex
        .map { case ((p1, p2), i) => (i, p1, p2) }
        .toDF("rank", "p1", "p2")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/rules")
    }
    Warehouse.sidecarValue(s, s"rules:$base")(
      Warehouse.readParquet(s, s"$base/rules").orderBy("rank")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq)
  }

  /** doc_id + the BPE-encoded unit string (the stored merge table's
    * rules applied as BPE_MERGES chained replace passes) — shared by
    * `d_text_tokens_bpe` and the BPE-precise token-budget/curriculum
    * keys so "token count" means ONE thing across the catalog. */
  private[pipeline] def bpeEncodedUnits(s: SparkSession, d: String): DataFrame = {
    val rules = bpeRulesStored(s, d)
    val enc = rules.foldLeft("u") { case (e, (p1, p2)) =>
      s"replace($e, ' $p1 $p2 ', ' $p1$p2 ')"
    }
    bpeInit(s, d).withColumn("u", expr(enc))
  }

  /** (doc_id, n_tokens) under the trained BPE merge table — the subword
    * token counter budget/packing work composes with (vs the chars/4
    * estimate in `d_text_tokens`). Steady state reads the KB-scale
    * stored rules and encodes per row: codegen'd string work, no
    * shuffle. */
  private[pipeline] def bpeTokenCounts(s: SparkSession, d: String): DataFrame =
    bpeEncodedUnits(s, d).select(col("doc_id"),
      expr("size(filter(split(trim(u), ' '), x -> x <> '|' AND x <> ''))")
        .cast("long").as("n_tokens"))

  /** The BPE training + encoding replayed in DuckDB as BPE_MERGES
    * chained (pairs, argmax-rule, replace) CTE triples — the CTE LIST
    * only (no WITH), so budget/curriculum oracles can compose it into
    * their own WITH chains. `s$BPE_MERGES` is the encoded-units relation
    * (doc_id, u). Mirrors bpeInit/bpeRules expression for expression.
    *
    * Every step is `AS MATERIALIZED`: DuckDB 1.0 INLINES each CTE at
    * every reference site, and `s_{i-1}` is referenced twice per merge
    * (by `p_i` and `s_i`) — inlined, the chain re-expands ~2^BPE_MERGES
    * copies of s0 (measured: 223 s at sf0.001 for the tokens key alone,
    * and the curriculum composition under WITH RECURSIVE never
    * finished). Materialized, each step runs once: ~9 s. */
  private[pipeline] def bpeCtes: String = {
    val init =
      """s0 AS MATERIALIZED (
           SELECT doc_id,
                  CASE WHEN nt = '' THEN ' ' ELSE
                    ' ' || array_to_string(list_transform(string_split(nt, ' '),
                      w -> array_to_string(regexp_extract_all(w, '[a-z0-9]'), ' ')),
                      ' | ') || ' ' END AS u
           FROM (SELECT doc_id,
                        trim(regexp_replace(regexp_replace(lower(text),
                          '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
                 FROM documents))"""
    val iters = (1 to BPE_MERGES).map { i =>
      s"""p$i AS MATERIALIZED (
           SELECT w[i] AS p1, w[i + 1] AS p2
           FROM (SELECT string_split(trim(u), ' ') AS w,
                        unnest(generate_series(1,
                          len(string_split(trim(u), ' ')) - 1)) AS i
                 FROM s${i - 1})),
         r$i AS MATERIALIZED (
           SELECT p1, p2 FROM (
             SELECT p1, p2, COUNT(*) AS c FROM p$i
             WHERE p1 <> '|' AND p2 <> '|' AND p1 <> '' AND p2 <> ''
             GROUP BY 1, 2
             UNION ALL SELECT '~', '~', -1)
           ORDER BY c DESC, p1, p2 LIMIT 1),
         s$i AS MATERIALIZED (
           SELECT doc_id,
                  replace(u, ' ' || p1 || ' ' || p2 || ' ',
                          ' ' || p1 || p2 || ' ') AS u
           FROM s${i - 1}, r$i)"""
    }.mkString(",\n")
    s"""$init,
       $iters"""
  }

  /** The DuckDB token-count expression over an encoded unit string `u` —
    * textually one thing wherever BPE counts appear in an oracle. */
  private[pipeline] val bpeCountSql =
    """CAST(len(list_filter(string_split(trim(u), ' '),
         x -> x <> '|' AND x <> '')) AS BIGINT)"""

  /** The d_text_tokens_bpe oracle: the shared CTE chain + the count/fp
    * projection. */
  private def bpeOracleSql: String =
    s"""WITH $bpeCtes
       SELECT doc_id,
              $bpeCountSql AS n_tokens,
              md5(u) AS tok_fp
       FROM s$BPE_MERGES ORDER BY doc_id"""

  /** Per-position bigram stream (doc_id, pos, w1, w2) — the scoring
    * input, recomputed per call (linear, no shuffle before the join). */
  private def lmBigrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), posexplode(expr(
        """CASE WHEN size(w) >= 2
             THEN transform(sequence(1, size(w) - 1),
                    i -> struct(element_at(w, i) AS w1,
                                element_at(w, i + 1) AS w2))
             ELSE array() END""")))
      .select(col("doc_id"), col("pos"),
        col("col.w1").as("w1"), col("col.w2").as("w2"))

  /** The TRAINED bigram LM — C(w1) and C(w1,w2) count tables — built
    * once per corpus version and stored (vocabulary-bounded artifacts;
    * production trains the filter LM at corpus release and every scoring
    * job loads it, exactly like the dedup backbone and the eval blooms). */
  private def lmModelStore(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base =
      s"${Warehouse.versionDir(s, d, "documents.parquet")}/lm"
    Warehouse.ensure(s, base) {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      docs.select(explode(col("w")).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("cu"))
        .write.mode("overwrite").parquet(s"$base/uni")
      lmBigrams(s, d).groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
        .write.mode("overwrite").parquet(s"$base/big")
    }
    (Warehouse.readParquet(s, s"$base/uni"), Warehouse.readParquet(s, s"$base/big"))
  }

  val queries: Map[String, Q] = Map(
    // Quality scoring: length/word/uniqueness/stopword ratios.
    "d_text_quality" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"), col("n_chars"),
          size(col("words")).as("n_words"),
          size(array_distinct(col("words"))).as("n_uniq"),
          TextDedup.uniqRatioCol.as("uniq_ratio"),
          round(expr("aggregate(transform(words, x -> length(x)), 0, (a, v) -> a + v)") /
            size(col("words")).cast("double"), 6).as("avg_word_len"),
          round(size(array_intersect(array_distinct(col("words")), arrayLit(stopEn))) /
            size(array_distinct(col("words"))).cast("double"), 6).as("stopword_ratio"))
        .orderBy("doc_id")
    }),

    // Language ID by stopword-hit scoring with a deterministic tiebreak.
    "d_text_langid" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("uw", array_distinct(split(col("text"), " ")))
        .select(col("doc_id"), col("lang").as("declared_lang"),
          size(array_intersect(col("uw"), arrayLit(stopEn))).as("s_en"),
          size(array_intersect(col("uw"), arrayLit(stopDe))).as("s_de"),
          size(array_intersect(col("uw"), arrayLit(stopFr))).as("s_fr"))
        .withColumn("pred_lang",
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
            .when(col("s_de") >= col("s_fr"), "de")
            .otherwise("fr"))
        .orderBy("doc_id")
    }),

    // True-BPE token counting (r17 stretch): a REAL merge table trained
    // on the corpus itself (deterministic, corpus-derived like
    // d_lm_score's bigram MLE), replacing the chars/4 estimate for
    // budget work that needs subword precision. Contract (documented,
    // engine-exact): normalize (the shared normCol chain), initial
    // units = the characters of each word with '|' as the word-separator
    // unit; train BPE_MERGES rules by repeatedly (a) counting adjacent
    // non-separator unit pairs corpus-wide, (b) taking the argmax under
    // the (count DESC, p1 ASC, p2 ASC) total order — a '~' sentinel rule
    // at count -1 keeps exhausted corpora well-defined (its replace is a
    // no-op) — and (c) applying the rule as ONE rescan-free left-to-right
    // replace pass over the unit strings. The single-pass application is
    // the one stated deviation from textbook BPE: inside a uniform run
    // the pass's delimiter consumption can group pairs differently than
    // greedy-with-rescan (token COUNT is unchanged there), and the same
    // pass semantics run in BOTH engines, so the DuckDB oracle replays
    // training + encoding bit-for-bit — tok_fp pins the whole
    // tokenization, not just counts. Scale: training is K linear passes
    // (here over the full corpus; at 100 TB train on the d_sample_split
    // md5-prefix deterministic sample — `bpeRulesSampledStored`, the
    // spec-pinned sampled trainer — the merge table is vocabulary-sized
    // either way); encoding is per-row codegen'd string work,
    // embarrassingly parallel.
    "d_text_tokens_bpe" -> ((s, d) => {
      bpeEncodedUnits(s, d)
        .select(col("doc_id"),
          expr("size(filter(split(trim(u), ' '), x -> x <> '|' AND x <> ''))")
            .cast("long").as("n_tokens"),
          md5(col("u").cast("binary")).as("tok_fp"))
        .orderBy("doc_id")
    }),

    // Token counting: whitespace, regex word-tokens, and a BPE-ish
    // chars/4 estimate (the standard subword budget heuristic).
    "d_text_tokens" -> ((s, d) => {
      Tables.documents(s, d).select(col("doc_id"),
          size(split(col("text"), " ")).as("n_ws_tokens"),
          regexp_count(col("text"), lit("[a-zA-Z0-9]+")).as("n_re_tokens"),
          ceil(col("n_chars") / 4.0).cast("long").as("n_bpe_est"))
        .orderBy("doc_id")
    }),

    // Context-window document chunking — the training-prep op that cuts
    // each document into overlapping word windows (24-word windows,
    // 6-word overlap → stride 18), the row shape a tokenizer/packer
    // consumes downstream (the INVERSE of d_pack_sequences, which
    // concatenates whole short docs; chunking splits long ones). Pure
    // per-row explode — embarrassingly parallel, output rows bounded by
    // n_words/stride per doc, no shuffle before the deterministic sort.
    // Chunk count = ceil(max(n_words − overlap, 1) / stride), so the
    // final window is the only short one and no chunk is a suffix of
    // its neighbor.
    "d_doc_chunks" -> ((s, d) => {
      val W = 24; val O = 6; val S = W - O
      Tables.documents(s, d)
        .withColumn("w", split(col("text"), " "))
        .withColumn("nc", expr(
          s"CAST((greatest(size(w) - $O, 1) + ${S - 1}) DIV $S AS INT)"))
        .withColumn("chunk_id", explode(expr("sequence(0, nc - 1)")))
        .select(col("doc_id"), col("chunk_id"),
          expr(s"array_join(slice(w, chunk_id * $S + 1, $W), ' ')")
            .as("chunk_text"),
          expr(s"size(slice(w, chunk_id * $S + 1, $W))").cast("int")
            .as("n_words"))
        .orderBy("doc_id", "chunk_id")
    }),

    // Global n-gram frequency table — the corpus-statistics op (vocab /
    // n-gram counting over the whole corpus): explode bigram occurrences,
    // one hash agg (map-side partial), top-100. At 100 TB this is one
    // scan + one shuffle of partial counts bounded by |vocab²|.
    "d_text_ngram_freq" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("w", split(lower(col("text")), " "))
        .select(explode(expr(
          """CASE WHEN size(w) >= 2
               THEN transform(sequence(1, size(w) - 1),
                      i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))
               ELSE array() END""")).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bg"))
        .limit(100)
    }),

    // Deterministic hash-based corpus split (CH SAMPLE semantics: a hash
    // of the sampling key, not an RNG): reproducible across runs, engines
    // and cluster sizes — the train/val/held-out assignment a pretraining
    // pipeline needs to survive re-shards and backfills. First md5 hex
    // digit partitions 16 ways: 0 → val (1/16), 1 → test (1/16), rest
    // train. A pure per-row projection: no shuffle, scales linearly.
    "d_sample_split" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1).as("h"))
        .select(col("doc_id"),
          when(col("h") === "0", "val")
            .when(col("h") === "1", "test")
            .otherwise("train").as("split"))
        .orderBy("doc_id")
    }),

    // Text canonicalization — the normalization pass every curation
    // pipeline runs before fingerprinting/dedup so that near-identical
    // byte streams collapse: lowercase, strip non-alphanumerics to
    // spaces, collapse whitespace runs, trim. Pure per-row projection
    // (no shuffle); both engines share the same regex semantics, so the
    // canonical text — and the md5 over it — hash-match exactly.
    "d_text_normalize" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("norm", normCol)
        .select(col("doc_id"), col("norm"),
          length(col("norm")).as("n_norm_chars"),
          md5(col("norm").cast("binary")).as("norm_fp"))
        .orderBy("doc_id")
    }),

    // Bigram language-model quality score — the classic perplexity-style
    // filter a pretraining pipeline runs over every document: train MLE
    // bigram stats ON the corpus (C(w1,w2) bigram counts, C(w1) word
    // counts — two hash aggs, map-side partials), then score each doc by
    // the mean log-probability of its bigrams. Low avg_logp = improbable
    // word sequences = boilerplate/garbage candidates. All joins are
    // key-shuffles on the vocab, never row×row; at 100 TB the count
    // tables are |vocab|-bounded. Docs under two words carry no bigram
    // evidence and are excluded (both engines).
    //
    // Determinism: ln() may differ between engines in the last ulp, so
    // each term is rounded to 6 places first (count ratios repeat
    // heavily, so the tie budget is tiny); the per-doc sum then runs as
    // the SAME left fold over the same position-ordered list on both
    // engines (aggregate HOF ≡ list_reduce, the o_w9 device).
    "d_lm_score" -> ((s, d) => {
      val bg = lmBigrams(s, d)
      val (uni, big) = lmModelStore(s, d)
      // no broadcast hint: the model is VOCABULARY-bounded, which is
      // small here but can be tens of millions of bigrams on a real
      // corpus — AQE broadcasts when the actual size allows
      bg.join(big, Seq("w1", "w2")).join(uni, Seq("w1"))
        .withColumn("logp", round(log(col("cb") / col("cu")), 6))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(expr("""aggregate(
                          transform(array_sort(collect_list(struct(pos, logp))),
                                    x -> x.logp),
                          0D, (a, x) -> a + x)""") / count(lit(1)), 6)
            .as("avg_logp"))
        .orderBy("doc_id")
    }),

    // Document fingerprint: md5 of the sorted distinct word set (word-
    // order-insensitive near-dup key) + per-fingerprint group size.
    "d_text_fingerprint" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(array_join(array_sort(array_distinct(split(lower(col("text")), " "))), " ")
            .cast("binary")).as("fp"))
        .withColumn("n_same_fp", count(lit(1)).over(Window.partitionBy("fp")))
        .orderBy("doc_id")
    })
  )

  private def sqlList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("[", ",", "]")

  val oracles: Map[String, String] = Map(
    "d_text_normalize" ->
      """SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                    ' +', ' ', 'g')) AS norm,
                CAST(length(trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS INT) AS n_norm_chars,
                md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                        ' +', ' ', 'g'))) AS norm_fp
         FROM documents ORDER BY doc_id""",

    "d_text_quality" ->
      s"""SELECT doc_id, n_chars,
                 CAST(len(w) AS INT) AS n_words,
                 CAST(len(list_distinct(w)) AS INT) AS n_uniq,
                 round(len(list_distinct(w)) / CAST(len(w) AS DOUBLE), 6) AS uniq_ratio,
                 round(list_sum(list_transform(w, x -> length(x))) /
                       CAST(len(w) AS DOUBLE), 6) AS avg_word_len,
                 round(len(list_intersect(list_distinct(w), ${sqlList(stopEn)})) /
                       CAST(len(list_distinct(w)) AS DOUBLE), 6) AS stopword_ratio
          FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents)
          ORDER BY doc_id""",

    "d_text_langid" ->
      s"""SELECT doc_id, declared_lang, s_en, s_de, s_fr,
                 CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                      WHEN s_de >= s_fr THEN 'de'
                      ELSE 'fr' END AS pred_lang
          FROM (
            SELECT doc_id, lang AS declared_lang,
                   CAST(len(list_intersect(uw, ${sqlList(stopEn)})) AS INT) AS s_en,
                   CAST(len(list_intersect(uw, ${sqlList(stopDe)})) AS INT) AS s_de,
                   CAST(len(list_intersect(uw, ${sqlList(stopFr)})) AS INT) AS s_fr
            FROM (SELECT doc_id, lang,
                         list_distinct(string_split(text, ' ')) AS uw
                  FROM documents))
          ORDER BY doc_id""",

    // Chunk arithmetic mirrors verbatim: greatest/ceil-division for the
    // count, 1-based slice of the split stream (DuckDB list_slice takes
    // an END index where Spark slice takes a LENGTH — same window).
    "d_doc_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
         n AS (SELECT doc_id, w,
                      CAST((greatest(len(w) - 6, 1) + 17) // 18 AS INT) AS nc
               FROM d),
         c AS (SELECT doc_id, w, CAST(k AS INT) AS chunk_id
               FROM n, unnest(generate_series(0, nc - 1)) AS t(k))
         SELECT doc_id, chunk_id,
                array_to_string(list_slice(w, chunk_id * 18 + 1,
                                           chunk_id * 18 + 24), ' ')
                  AS chunk_text,
                CAST(len(list_slice(w, chunk_id * 18 + 1,
                                    chunk_id * 18 + 24)) AS INT) AS n_words
         FROM c ORDER BY doc_id, chunk_id""",

    "d_text_tokens" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
                CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS INT) AS n_re_tokens,
                CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_bpe_est
         FROM documents ORDER BY doc_id""",

    "d_text_tokens_bpe" -> bpeOracleSql,

    "d_text_ngram_freq" ->
      """SELECT bg, COUNT(*) AS n FROM (
           SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i + 1])) AS bg
           FROM (SELECT string_split(lower(text), ' ') AS w FROM documents)
           WHERE len(w) >= 2)
         GROUP BY bg ORDER BY n DESC, bg LIMIT 100""",

    "d_sample_split" ->
      """SELECT doc_id,
                CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                  WHEN '0' THEN 'val' WHEN '1' THEN 'test'
                  ELSE 'train' END AS split
         FROM documents ORDER BY doc_id""",

    "d_lm_score" ->
      """WITH docs AS (
           SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
         bg AS (
           SELECT doc_id, i AS pos, w[i] AS w1, w[i + 1] AS w2
           FROM (SELECT doc_id, w,
                        unnest(generate_series(1, len(w) - 1)) AS i
                 FROM docs WHERE len(w) >= 2)),
         uni AS (
           SELECT w1, COUNT(*) AS cu
           FROM (SELECT unnest(w) AS w1 FROM docs) GROUP BY w1),
         bgc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
         terms AS (
           SELECT b.doc_id, b.pos,
                  round(ln(CAST(cb AS DOUBLE) / cu), 6) AS logp
           FROM bg b JOIN bgc USING (w1, w2) JOIN uni USING (w1)),
         g AS (
           SELECT doc_id, COUNT(*) AS n_bigrams,
                  list(logp ORDER BY pos) AS ls
           FROM terms GROUP BY doc_id)
         SELECT doc_id, n_bigrams,
                round(list_reduce(ls, (a, x) -> a + x) / n_bigrams, 6) AS avg_logp
         FROM g ORDER BY doc_id""",

    "d_text_fingerprint" ->
      """SELECT doc_id,
                md5(array_to_string(list_sort(list_distinct(
                  string_split(lower(text), ' '))), ' ')) AS fp,
                COUNT(*) OVER (PARTITION BY md5(array_to_string(list_sort(
                  list_distinct(string_split(lower(text), ' '))), ' '))) AS n_same_fp
         FROM documents ORDER BY doc_id"""
  )
}
