package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed curation pipeline — normalize → dedup → quality gate →
  * sequence packing — as ONE catalog query, so the whole
  * corpus-to-training-shards path is a single Spark plan instead of four
  * materialized passes.
  *
  * Composition semantics (each stage is the already-oracled operator):
  *  - normalize feeds the EXACT-dup fingerprint: md5 over the
  *    canonicalized text (`d_text_normalize`'s regex chain), so byte-level
  *    variants of the same document collapse before near-dup ever runs;
  *  - near-dup keep-best + quality gate are `d_curation_apply`'s cascade
  *    verbatim (precedence: exact > near-dup non-keeper > quality);
  *  - survivors pack into 2048-token sequences over 32 buckets
  *    (`d_pack_sequences`'s fold); dropped docs carry NULL pack columns so
  *    the output stays one auditable row per document.
  *
  * Scale shape: composing adds NO shuffle beyond the parts' own — the
  * fingerprint window and the decision join ride the same doc-keyed
  * exchanges `d_curation_apply` already pays, packing adds its one
  * bucket repartition, and the final left join is doc-keyed like the
  * decision join (EndToEndSpec pins the exchange count). At 100 TB this
  * is the difference between re-scanning the corpus four times and
  * scanning it once.
  */
object EndToEnd {

  /** The d_text_normalize canonicalization — shared single definition
    * (TextAnalysis.normCol), so the composed pipeline's fingerprint can
    * never drift from the standalone operator's. */
  private[pipeline] def normCol = TextAnalysis.normCol

  /** The un-materialized composed plan (exposed for the plan-audit spec:
    * Materialize.drop cuts lineage, so the audit needs the raw tree). */
  private[pipeline] def plan(
      s: SparkSession, d: String): (DataFrame, Seq[DataFrame]) = {
    val (keep, caches) = TextDedup.clusterKeepers(s, d)
    // THE shared exact-keeper shape (TextDedup.exactKeeperDecisions —
    // the `3440f12` skew fix): agg + join with a round-robin
    // repartition of the keeper side, so hot boilerplate fingerprints
    // stay map-side-combinable AND the join is AQE-skew-splittable. An
    // earlier inline copy here omitted the repartition and kept the
    // single-task hot-key shape the helper exists to prevent.
    val fps = Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
      md5(normCol.cast("binary")).as("fp"))
    val exact = TextDedup.exactKeeperDecisions(fps)
    // dec feeds BOTH the output rows and the packing branch; without the
    // persist Spark plans the whole keep/exact subtree twice (two corpus
    // scans, double the exchanges — measured 14 exchanges / 4 scans vs
    // 8 / 2 cached). Three narrow columns per doc, cheap to cache; at
    // cluster scale this is the decision table you'd materialize anyway.
    val dec = keep.join(exact, Seq("doc_id"))
      .select(col("doc_id"), col("n_chars"),
        when(col("doc_id") =!= col("exact_keep"), "drop_exact")
          .when(col("doc_id") =!= col("keep_id"), "drop_near_dup")
          .when(col("uniq_ratio") < 0.3, "drop_quality")
          .otherwise("kept").as("decision"))
      .persist()
    val packed = Packing.packSequences(
      dec.filter(col("decision") === "kept").select("doc_id", "n_chars"),
      capacity = 2048, buckets = 32)
    val out = dec.select("doc_id", "decision")
      .join(packed.select("doc_id", "bucket", "seq_no", "n_tokens", "seq_fill"),
        Seq("doc_id"), "left")
      .orderBy("doc_id")
    (out, caches :+ dec)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_pipeline_e2e" -> ((s, d) => {
      val (out, caches) = plan(s, d)
      Materialize.drop(out, caches: _*)
    })
  )

  val oracles: Map[String, String] = Map(
    // The parts' oracles composed: cluster closure + keep-best window
    // (TextDedup), the cascade with a NORMALIZED exact fingerprint, then
    // the packing fold (Packing) over the kept set only.
    "d_pipeline_e2e" ->
      s"""WITH RECURSIVE ${TextDedup.clustersCte},
          ${TextDedup.keeperCte},
          ex AS (
            SELECT doc_id, n_chars,
                   MIN(doc_id) OVER (
                     PARTITION BY md5(trim(regexp_replace(regexp_replace(
                       lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
                   ) AS exact_keep
            FROM documents),
          dec AS (
            SELECT k.doc_id, e.n_chars,
                   CASE WHEN k.doc_id <> e.exact_keep THEN 'drop_exact'
                        WHEN k.doc_id <> k.keep_id THEN 'drop_near_dup'
                        WHEN k.uniq_ratio < 0.3 THEN 'drop_quality'
                        ELSE 'kept' END AS decision
            FROM k JOIN ex e ON k.doc_id = e.doc_id),
          ord AS (
            SELECT doc_id, doc_id % 32 AS bucket,
                   CAST(ceil(n_chars / 4.0) AS BIGINT) AS t,
                   row_number() OVER (PARTITION BY doc_id % 32
                                      ORDER BY doc_id) AS i
            FROM dec WHERE decision = 'kept'),
          pack AS (
            SELECT bucket, i, doc_id, t,
                   CAST(0 AS BIGINT) AS seq_no, t AS seq_fill
            FROM ord WHERE i = 1
            UNION ALL
            SELECT o.bucket, o.i, o.doc_id, o.t,
                   CASE WHEN p.seq_fill + o.t > 2048
                        THEN p.seq_no + 1 ELSE p.seq_no END,
                   CASE WHEN p.seq_fill + o.t > 2048
                        THEN o.t ELSE p.seq_fill + o.t END
            FROM pack p JOIN ord o ON o.bucket = p.bucket AND o.i = p.i + 1)
          SELECT d.doc_id, d.decision,
                 p.bucket, p.seq_no, p.t AS n_tokens, p.seq_fill
          FROM dec d LEFT JOIN pack p ON d.doc_id = p.doc_id
          ORDER BY d.doc_id"""
  )
}
