package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Sequence packing — the step between a curated corpus and a pretraining
  * run: documents are concatenated greedily into fixed token-budget
  * sequences (context windows), and the packing must be DETERMINISTIC so
  * a re-run (or a backfill on a different cluster size) shards training
  * data identically.
  *
  * Semantics (greedy capacity-reset, the standard first-fit-in-order):
  * docs are assigned to `buckets` independent streams by `doc_id %
  * buckets`, walked in doc_id order; a doc joins the current sequence iff
  * it fits, else it opens the next one. An oversize doc (> capacity)
  * gets a sequence of its own. Token budget = the corpus's `ceil(n_chars
  * / 4)` BPE estimate (same convention as `d_text_tokens`).
  *
  * Spark shape: capacity-reset is a PREFIX-DEPENDENT fold — not
  * window-expressible (no associative reformulation exists) — so this is
  * the rare legitimate `mapPartitions`: repartition by bucket,
  * sortWithinPartitions(bucket, doc_id), then ONE streaming pass with
  * O(1) state (current bucket, sequence number, fill), resetting at
  * bucket boundaries. No per-group collection, no driver traffic.
  *
  * 100 TB design: `buckets` is the parallelism knob — packing is
  * embarrassingly parallel ACROSS buckets, sequential only within one
  * (that's what makes it deterministic), so size buckets to executor
  * count; state stays O(1) regardless. The oracle replays the same fold
  * as a DuckDB recursive CTE.
  */
object Packing {

  /** @param docs     needs `doc_id` (unique, non-negative) and `n_chars`
    * @param capacity token budget per packed sequence
    * @param buckets  independent packing streams (parallelism knob) */
  def packSequences(docs: DataFrame, capacity: Long, buckets: Int): DataFrame = {
    require(capacity > 0 && buckets > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        (col("doc_id") % buckets).cast("long").as("bucket"),
        ceil(col("n_chars") / 4.0).cast("long").as("n_tokens"))
      .select("bucket", "doc_id", "n_tokens").as[(Long, Long, Long)]
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "doc_id")
      .mapPartitions { it =>
        // one sequential pass per partition; buckets never span partitions
        // (hash-partitioned on bucket), so resets at boundaries suffice.
        // Split condition matches the oracle's recursive fold EXACTLY:
        // every non-first row splits when fill + t > capacity — including
        // from fill == 0 (a zero-token doc followed by an oversize one
        // must open a new sequence, as the recursion does); only the
        // bucket's first row is split-exempt.
        var curBucket = Long.MinValue
        var seqNo = 0L
        var fill = 0L
        it.map { case (bucket, docId, t) =>
          if (bucket != curBucket) { curBucket = bucket; seqNo = 0L; fill = t }
          else if (fill + t > capacity) { seqNo += 1L; fill = t }
          else fill += t
          (docId, bucket, seqNo, t, fill)
        }
      }
      .toDF("doc_id", "bucket", "seq_no", "n_tokens", "seq_fill")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_pack_sequences" -> ((s, d) =>
      packSequences(Tables.documents(s, d), capacity = 2048, buckets = 32)
        .orderBy("doc_id"))
  )

  val oracles: Map[String, String] = Map(
    "d_pack_sequences" ->
      """WITH RECURSIVE ord AS (
           SELECT doc_id, doc_id % 32 AS bucket,
                  CAST(ceil(n_chars / 4.0) AS BIGINT) AS t,
                  row_number() OVER (PARTITION BY doc_id % 32
                                     ORDER BY doc_id) AS i
           FROM documents),
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
         SELECT doc_id, bucket, seq_no, t AS n_tokens, seq_fill
         FROM pack ORDER BY doc_id"""
  )
}
