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
      .withColumn("fp", md5(lower(col("text")).cast("binary")))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("fp")).as("min_fp"),
        max(col("fp")).as("max_fp"))

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
      manifest(Tables.documents(s, d), hexChars = 1).orderBy("shard_id"))
  )

  val oracles: Map[String, String] = Map(
    "d_shard_manifest" ->
      """SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard_id,
                COUNT(*) AS n_docs,
                CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
                CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                MIN(md5(lower(text))) AS min_fp,
                MAX(md5(lower(text))) AS max_fp
         FROM documents GROUP BY 1 ORDER BY 1"""
  )
}
