package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.Tables

/** Training-shard output — the write step between a curated/packed corpus
  * and the trainer's data loader: documents are hash-assigned to shards,
  * each shard written as one doc_id-sorted parquet partition, with a
  * MANIFEST table a trainer (or a re-run audit) can read instead of the
  * payload.
  *
  * Determinism contract (same rationale as [[Packing]]): the shard key is
  * the md5 of the doc_id, NOT an RNG or a round-robin over task order —
  * so a backfill on a different cluster size, or a DuckDB/other-engine
  * re-derivation, lands every document in the same shard. 16^hexChars
  * shards; one hex char = 16 shards for the test corpus, production picks
  * 3-4 chars (4096-65536 shards) to keep shards in the low-GB range.
  *
  * 100 TB design: one hash shuffle on shard_id (the write's natural
  * partitioning — no second shuffle for the sort, sortWithinPartitions
  * rides the same exchange), manifest aggregation combines map-side. The
  * manifest's content envelope (lexicographic min/max of per-doc
  * fingerprints) is order-insensitive, so it is reproducible under AQE /
  * speculative retries, and lets an audit confirm two runs shipped the
  * same corpus without re-reading payload bytes.
  */
object Shards {

  /** Shard key: first `hexChars` of md5(doc_id) — reproducible across
    * engines, runs, and cluster sizes. */
  def withShard(docs: DataFrame, hexChars: Int): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8)
    docs.withColumn("shard_id",
      substring(md5(col("doc_id").cast("string").cast("binary")), 1, hexChars))
  }

  /** Per-shard manifest: doc/token/char totals plus a content envelope
    * (min/max md5 of the lowercased text) for byte-free run audits. */
  def manifest(docs: DataFrame, hexChars: Int = 1): DataFrame =
    withShard(docs, hexChars)
      .withColumn("fp", TextDedup.fpCol)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("fp")).as("min_fp"),
        max(col("fp")).as("max_fp"))

  /** INCREMENTAL manifest maintenance — the trainer-facing delta when a
    * corpus version advances: the next-version per-shard manifest (doc /
    * token / char totals and the content envelope over the docs the
    * curation cascade KEEPS) annotated with, per shard, how many docs
    * the new version adds and removes relative to the PREVIOUS version
    * (the cascade evaluated over the stored history tables — the same
    * state the delta/drift queries probe). A shard with
    * `changed = 0` is certified untouched: its data file and manifest
    * row from the previous run can be served as-is, so a daily 100 TB
    * advance re-ships only the shards the batch actually disturbed
    * (md5 assignment never moves a doc between shards, so membership
    * diffs are the ONLY way a shard changes).
    *
    * Scale shape: stored-table reads + the cascade's cluster window and
    * keyed joins (shared with `d_curation_apply`/`d_curation_drift`) +
    * ONE shard-keyed aggregation that combines map-side. No signature,
    * CC, or text work at all: the fingerprint, token-count, and char
    * columns the manifest ships come from the fps2 store (one text scan
    * per corpus VERSION, paid at backbone build), so the nightly
    * manifest advance is pure stored-table reads end to end. */
  def deltaManifest(s: SparkSession, d: String,
                    hexChars: Int = 1): DataFrame = {
    val cur = TextDedup.curationDecisions(s, d)
    val prev = TextDedup.prevDecisions(s, d)
    val stats = Backbone.fingerprints(s, d)
      .select(col("doc_id"), col("fp"), col("n_tokens"), col("n_chars"))
    val joined = withShard(
      cur.join(prev, Seq("doc_id"), "left").join(stats, Seq("doc_id")),
      hexChars)
      .withColumn("kept_now", (col("decision") === "kept").cast("long"))
      .withColumn("kept_prev",
        (coalesce(col("decision_prev"), lit("absent")) === "kept")
          .cast("long"))
    joined.groupBy("shard_id")
      .agg(
        sum(col("kept_now")).as("n_docs"),
        sum(when(col("kept_now") === 1L, col("n_tokens")).otherwise(0L))
          .as("n_tokens"),
        sum(when(col("kept_now") === 1L, col("n_chars")).otherwise(lit(0)))
          .cast("long").as("n_chars"),
        min(when(col("kept_now") === 1L, col("fp"))).as("min_fp"),
        max(when(col("kept_now") === 1L, col("fp"))).as("max_fp"),
        sum(when(col("kept_now") === 1L && col("kept_prev") === 0L, 1L)
          .otherwise(0L)).as("n_added"),
        sum(when(col("kept_prev") === 1L && col("kept_now") === 0L, 1L)
          .otherwise(0L)).as("n_removed"))
      .withColumn("changed",
        ((col("n_added") + col("n_removed")) > 0).cast("int"))
  }

  /** Write `dir/data/shard_id=<k>/` (doc_id-sorted parquet, one file per
    * shard) and `dir/manifest/` describing exactly what was written. */
  def write(docs: DataFrame, dir: String, hexChars: Int = 1): Unit = {
    withShard(docs, hexChars)
      .repartition(col("shard_id"))
      .sortWithinPartitions("shard_id", "doc_id")
      .write.mode(SaveMode.Overwrite).partitionBy("shard_id")
      .parquet(s"$dir/data")
    manifest(docs, hexChars)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/manifest")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_shard_manifest" -> ((s, d) =>
      manifest(Tables.documents(s, d), hexChars = 1).orderBy("shard_id")),

    // Incremental shard maintenance: next-version manifest over the
    // cascade's kept docs + per-shard added/removed vs the previous
    // version from STORED history state; changed=0 certifies the shard
    // needs no re-ship. Oracled bit-for-bit against the twice-composed
    // cascade (the same CTE prefix as d_curation_drift).
    "d_shard_delta" -> ((s, d) =>
      deltaManifest(s, d, hexChars = 1).orderBy("shard_id"))
  )

  val oracles: Map[String, String] = Map(
    "d_shard_manifest" ->
      """SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard_id,
                COUNT(*) AS n_docs,
                CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
                CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                MIN(md5(lower(text))) AS min_fp,
                MAX(md5(lower(text))) AS max_fp
         FROM documents GROUP BY 1 ORDER BY 1""",

    "d_shard_delta" ->
      s"""WITH RECURSIVE ${TextDedup.twoVersionCtes}
          SELECT substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 1) AS shard_id,
                 CAST(SUM(CASE WHEN c.decision = 'kept'
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
                 CAST(SUM(CASE WHEN c.decision = 'kept'
                               THEN len(string_split(dd.text, ' '))
                               ELSE 0 END) AS BIGINT) AS n_tokens,
                 CAST(SUM(CASE WHEN c.decision = 'kept'
                               THEN dd.n_chars ELSE 0 END) AS BIGINT)
                   AS n_chars,
                 MIN(CASE WHEN c.decision = 'kept'
                          THEN md5(lower(dd.text)) END) AS min_fp,
                 MAX(CASE WHEN c.decision = 'kept'
                          THEN md5(lower(dd.text)) END) AS max_fp,
                 CAST(SUM(CASE WHEN c.decision = 'kept'
                                AND COALESCE(p.decision_prev, 'absent')
                                    <> 'kept'
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
                 CAST(SUM(CASE WHEN COALESCE(p.decision_prev, 'absent')
                                    = 'kept'
                                AND c.decision <> 'kept'
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                 CAST(SUM(CASE WHEN c.decision = 'kept'
                                AND COALESCE(p.decision_prev, 'absent')
                                    <> 'kept'
                               THEN 1 ELSE 0 END)
                      + SUM(CASE WHEN COALESCE(p.decision_prev, 'absent')
                                      = 'kept'
                                  AND c.decision <> 'kept'
                                 THEN 1 ELSE 0 END) > 0 AS INT) AS changed
          FROM cur c
          LEFT JOIN prev p ON c.doc_id = p.doc_id
          JOIN documents dd ON c.doc_id = dd.doc_id
          GROUP BY 1 ORDER BY 1"""
  )
}
