package graft.pipeline

import java.util.UUID

import scala.collection.mutable

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The materialized dedup BACKBONE — the stored signature / pair / label
  * tables every query in the curation cascade reads, built ONCE per
  * (corpus, band geometry) and shared.
  *
  * Rationale (the production shape at 100 TB): a curation *run* executes
  * exact dedup, near-dup clustering, keep-best selection, the composed
  * apply pass and the nightly delta — all on the SAME minhash+CC
  * backbone. Re-deriving it per query means four extra corpus scans and
  * four extra LSH+CC evaluations; materializing it once turns every
  * downstream query into a read of a docs-sized (fingerprints, labels)
  * or pairs-sized table. This is the "stored signature table" contract
  * the delta queries document: the tables live in the warehouse and are
  * maintained incrementally (DedupStream is the streaming writer's
  * shape); batch queries never recompute them.
  *
  * Storage: parquet under `graft.backbone.dir` (default: a per-JVM
  * scratch dir — each run derives fresh tables, so cross-run staleness
  * is impossible; point it at a warehouse path to keep them). Keyed by
  * corpus dir + band geometry. Build is all-Spark (the existing
  * [[TextDedup.minhashPairsPlan]] / [[Graph.minLabelComponents]]
  * plans); the only driver traffic is the CC loop's convergence scalar.
  */
private[graft] object Backbone {

  /** Per-JVM run token: backbone tables are derived data; scoping them
    * to the JVM run makes stale reads across data drops impossible. */
  private val runId = UUID.randomUUID().toString.take(8)

  private def rootDir: String = {
    val base = sys.props.getOrElse("graft.backbone.dir",
      new java.io.File(sys.props("java.io.tmpdir"), "graft-backbone").getPath)
    s"$base/$runId"
  }

  private def token(d: String): String = d.replaceAll("[^A-Za-z0-9.]", "_")

  /** Tables already written this JVM (paths). All mutation is under the
    * object lock; reads after the barrier are plain parquet scans. */
  private val built = mutable.Set[String]()

  private def ensure(path: String)(build: => Unit): Unit = synchronized {
    if (!built.contains(path)) { build; built += path }
  }

  /** Memoized corpus row count (per JVM, keyed by dir). A parquet-
    * metadata count is cheap, but each invocation is still one driver
    * job; the cascade sizes its broadcast gates and the delta split off
    * this once per corpus instead of once per consuming query. */
  private val counts = mutable.Map[String, Long]()
  def corpusCount(s: SparkSession, d: String): Long = synchronized {
    counts.getOrElseUpdate(d, Tables.documents(s, d).count())
  }

  /** Exact-dedup fingerprint table: (doc_id, fp) with fp = md5(lower
    * (text)) — one corpus scan, stored once, read by the exact query,
    * the curation cascade and the delta contract. */
  def fingerprints(s: SparkSession, d: String): DataFrame = {
    val path = s"$rootDir/${token(d)}/fps"
    ensure(path) {
      Tables.documents(s, d)
        .select(col("doc_id"), md5(lower(col("text")).cast("binary")).as("fp"))
        .write.mode("overwrite").parquet(path)
    }
    s.read.parquet(path)
  }

  /** Writes the banded-signature and verified-pair tables for a band
    * geometry in ONE evaluation of the minhash plan (bands feeds the
    * pair derivation; both land as parquet). */
  private def ensureMinhash(s: SparkSession, d: String,
                            nBands: Int, rowsPerBand: Int): String = {
    val base = s"$rootDir/${token(d)}/mh${nBands}x$rowsPerBand"
    ensure(base) {
      val plan = TextDedup.minhashPairsPlan(s, d, nBands, rowsPerBand)
      plan.bands.write.mode("overwrite").parquet(s"$base/bands")
      plan.pairs.write.mode("overwrite").parquet(s"$base/pairs")
      plan.caches.foreach(_.unpersist())
    }
    base
  }

  /** Stored banded signatures (doc_id, band, bkey) — the table a nightly
    * delta probes and DedupStream bootstraps from. */
  def bands(s: SparkSession, d: String,
            nBands: Int = 4, rowsPerBand: Int = 2): DataFrame =
    s.read.parquet(s"${ensureMinhash(s, d, nBands, rowsPerBand)}/bands")

  /** Stored VERIFIED near-dup pairs (da, db, jaccard >= 0.5). */
  def pairs(s: SparkSession, d: String,
            nBands: Int = 4, rowsPerBand: Int = 2): DataFrame =
    s.read.parquet(s"${ensureMinhash(s, d, nBands, rowsPerBand)}/pairs")

  /** Stored cluster labels (doc_id, cluster_id) — connected components
    * over the default-geometry pair graph; docs in no near-dup pair are
    * absent (callers coalesce to doc_id for singleton semantics). */
  def labels(s: SparkSession, d: String): DataFrame = {
    val path = s"$rootDir/${token(d)}/labels"
    ensure(path) {
      val edges = Graph.symmetrize(pairs(s, d), "da", "db").persist()
      val (lbl, caches) = Graph.minLabelComponents(edges)
      lbl.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
        .write.mode("overwrite").parquet(path)
      (edges +: caches).foreach(_.unpersist())
    }
    s.read.parquet(path)
  }

  /** Separately-persisted HISTORY tables for the stored-delta contract
    * (`d_dedup_delta_stored`): keeper-per-fingerprint, banded signatures
    * and shingle sets for documents below `split` ONLY. In production
    * these are yesterday's warehouse tables, maintained incrementally;
    * the nightly delta probes them with batch-only signatures and never
    * scans history text again. */
  final case class HistoryTables(keepers: DataFrame, bands: DataFrame,
                                 sets: DataFrame)

  def history(s: SparkSession, d: String, split: Long): HistoryTables = {
    val base = s"$rootDir/${token(d)}/hist$split"
    ensure(base) {
      val hist = Tables.documents(s, d).filter(col("doc_id") < split)
      val sp = TextDedup.signaturePlan(hist, nBands = 4, rowsPerBand = 2)
      sp.bands.write.mode("overwrite").parquet(s"$base/bands")
      sp.docSets.write.mode("overwrite").parquet(s"$base/sets")
      hist.select(col("doc_id"), md5(lower(col("text")).cast("binary")).as("fp"))
        .groupBy("fp").agg(min("doc_id").as("keep_id"))
        .write.mode("overwrite").parquet(s"$base/keepers")
      sp.caches.foreach(_.unpersist())
    }
    HistoryTables(
      s.read.parquet(s"$base/keepers"),
      s.read.parquet(s"$base/bands"),
      s.read.parquet(s"$base/sets"))
  }

  /** Build every table the catalog's cascade reads (both delta
    * geometries and the stored-history tables included) — Bench calls
    * this up front so the reported per-query timings uniformly measure
    * the shared-backbone regime and the one-time build cost is its own
    * line item. */
  def prebuild(s: SparkSession, d: String): Unit = {
    fingerprints(s, d)
    labels(s, d) // builds the 4x2 bands/pairs en route
    pairs(s, d, nBands = 4, rowsPerBand = 4)
    history(s, d, TextDedup.deltaSplit(s, d))
  }
}
