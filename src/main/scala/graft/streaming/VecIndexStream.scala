package graft.streaming

import graft.pipeline.{BandedGeom, Similarity, VecBackbone}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

/** Embedding ingest event — a vector arriving for indexing. */
case class VecEvent(vec_id: Long, embedding: Seq[Float])

/** Streaming VECTOR-INDEX WRITER — the ingest half of the embedding
  * warehouse loop, mirroring [[DedupStream.historyWriter]] on the
  * vector side: as embeddings arrive, persist the raw sign-LSH bucket
  * and IVF/PQ code tables that the stored-delta probe
  * (`d_semantic_delta_stored`) and the incremental advance
  * (`VecBackbone.advance`) consume. The batch pipeline never re-encodes
  * ingested vectors: the stream already paid that assignment once,
  * under the PINNED quantizer the caller passes (the trained-once
  * artifact `VecBackbone.quantizer` persists — at ingest time it is
  * loaded once and baked into the writer, exactly how a production ANN
  * ingest ships its codebooks to the indexing tier).
  *
  * Layout: `baseDir/{buckets,codes}/batch=<id>/…` — one overwritten
  * partition directory per micro-batch, so a replayed batch (the
  * at-least-once case foreachBatch exposes) rewrites its own partition
  * instead of appending duplicates; readers get exactly-once tables by
  * construction. Derivations (axis-sign bucketing, fused argmin encode)
  * are the batch pipeline's own, so stream-written tables equal
  * `VecBackbone.history`'s bit-for-bit (VecIndexStreamSpec pins both).
  * Pairs/labels are AGGREGATED state — derived at compaction time
  * (`VecBackbone.compact`), not appended by the stream.
  */
object VecIndexStream {

  private[graft] def writeIndexBatch(batch: DataFrame, batchId: Long,
                                     baseDir: String,
                                     q: VecBackbone.Quantizer,
                                     planes: Int = VecBackbone.Planes,
                                     geom: BandedGeom = VecBackbone.CatalogGeom,
                                     sq8Scale: Option[Double] = None): Unit = {
    val s = batch.sparkSession
    Similarity.register(s)
    val e = batch.select(col("vec_id"), col("embedding").cast("array<float>"))
    Similarity.signBuckets(s, e, planes)
      .write.mode("overwrite").parquet(s"$baseDir/buckets/batch=$batchId")
    // banded postings ride the same per-batch partition UNDER THE
    // PINNED GEOMETRY (VERDICT r14 #3): axis geometries validate per
    // row; seeded geometries derive their plane matrix from the pinned
    // (seed, dims) with no driver probe — so a production seeded index
    // streams exactly like the axis catalog one, and the banded
    // compaction/advance consume stream-written postings exactly like
    // the batch-built ones (spec-pinned). The geometry sidecar is
    // persisted once at the index root; every reader takes the
    // geometry FROM THE STORE, never from the writer's arguments.
    Similarity.bandedSignBucketsGeom(s, e, geom)
      .write.mode("overwrite").parquet(s"$baseDir/banded/batch=$batchId")
    // once per (JVM, dir, geometry): an EXISTING sidecar must MATCH the
    // writer's geometry — a stream restarted on an existing index with
    // a different geom would otherwise silently mix postings from two
    // plane sets under one stored geometry (the exact hazard the
    // sidecar exists to close); and the check must not cost a parquet
    // read per micro-batch on the ingest hot path, so the validated
    // (dir, tag) is memoized
    // memoize AFTER the check passes: memoizing first would let a retry
    // or in-JVM stream restart after a refusal skip the validation and
    // write mixed-geometry postings — the exact corruption the sidecar
    // exists to prevent
    if (!geomChecked.contains(s"$baseDir|${geom.tag}")) {
      VecBackbone.readGeomSidecar(s, baseDir, memoize = false) match {
        case Some(stored) =>
          require(stored == geom,
            s"index at $baseDir was built under $stored; refusing to " +
              s"stream postings under $geom — one stored index, one " +
              "geometry (rebuild into a fresh dir to change it)")
        case None => VecBackbone.writeGeomSidecar(s, baseDir, geom)
      }
      geomChecked.add(s"$baseDir|${geom.tag}"): Unit
    }
    VecBackbone.encode(e, q)
      .write.mode("overwrite").parquet(s"$baseDir/codes/batch=$batchId")
    // SQ8 codes ride the same per-batch partition under the PINNED
    // SCALE (the sidecar discipline, third instance: quantizer,
    // geometry, now scale) — the encoder CLAMPS at ±127, so a batch
    // vector outgrowing the pinned scale degrades visibly (the
    // d_ann_sq8_clip audit) instead of corrupting the stored range. A
    // restart under a different scale refuses: mixed-scale code tables
    // are unreadable — every stored level's meaning is scale-relative.
    sq8Scale match {
      case Some(sc) =>
        // same add-after-validate discipline as the geometry sidecar
        if (!sq8Checked.contains(s"$baseDir|$sc")) {
          readSq8Scale(s, baseDir) match {
            case Some(stored) =>
              require(stored == sc,
                s"index at $baseDir stores SQ8 codes under scale $stored; " +
                  s"refusing to stream codes under $sc — one stored index, " +
                  "one scale (re-encode into a fresh dir to change it)")
            case None =>
              import s.implicits._
              Seq(sc).toDF("s").coalesce(1)
                .write.mode("overwrite").parquet(s"$baseDir/sq8scale")
          }
          sq8Checked.add(s"$baseDir|$sc"): Unit
          // a later None-writer on this dir must re-check: the sidecar
          // this branch may just have written invalidates a prior
          // "no-sidecar" verdict
          sq8Checked.remove(s"$baseDir|none"): Unit
        }
        VecBackbone.sq8EncodeUnder(
            e.select(col("vec_id"),
              org.apache.spark.sql.functions.expr(
                "CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
              .withColumn("s", org.apache.spark.sql.functions.lit(sc)), "s")
          .write.mode("overwrite").parquet(s"$baseDir/sq8/batch=$batchId")
      case None =>
        // a writer redeployed WITHOUT the scale on an index that carries
        // an SQ8 table would silently stop maintaining it — readers get a
        // partially-populated code table with no signal. Refuse instead.
        if (!sq8Checked.contains(s"$baseDir|none")) {
          require(readSq8Scale(s, baseDir).isEmpty,
            s"index at $baseDir carries an SQ8 code table (scale sidecar " +
              "present) but the writer was given no sq8Scale — pass the " +
              "pinned scale to keep maintaining it, or re-encode into a " +
              "fresh dir")
          sq8Checked.add(s"$baseDir|none"): Unit
        }
    }
  }

  /** (dir, scale) pairs already validated against / written to the SQ8
    * scale sidecar by THIS JVM — the geomChecked pattern. */
  private val sq8Checked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The pinned SQ8 scale a stream-written index encodes under; None
    * when the index carries no SQ8 table. */
  def readSq8Scale(s: SparkSession, baseDir: String): Option[Double] = {
    val p = new org.apache.hadoop.fs.Path(s"$baseDir/sq8scale")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(s.read.parquet(p.toString).head.getDouble(0))
  }

  /** Stream-written SQ8 codes (vec_id, codes, qq) — same layout as
    * [[graft.pipeline.VecBackbone.sq8Codes]]'s committed table. */
  def readSq8Codes(s: SparkSession, baseDir: String): DataFrame =
    s.read.parquet(s"$baseDir/sq8").drop("batch")

  /** (dir, geometry-tag) pairs already validated against / written to
    * the sidecar by THIS JVM — see the hot-path note above. */
  private val geomChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The streaming query writer; caller sets checkpointLocation/trigger
    * and starts it. `q` is the pinned quantizer the whole index lives
    * under (load it once via `VecBackbone.quantizer`); `geom` is the
    * pinned banded-LSH geometry — pass a seeded [[BandedGeom]] to
    * stream a production-recall index (its (seed, bands, planes, dims)
    * persists at the index root alongside the quantizer's sidecar). */
  def indexWriter(docs: Dataset[VecEvent], baseDir: String,
                  q: VecBackbone.Quantizer,
                  planes: Int = VecBackbone.Planes,
                  geom: BandedGeom = VecBackbone.CatalogGeom,
                  sq8Scale: Option[Double] = None)
      : DataStreamWriter[VecEvent] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[VecEvent], batchId: Long) =>
        writeIndexBatch(batch.toDF(), batchId, baseDir, q, planes, geom,
          sq8Scale)
      }

  /** Read stream-written index tables back (the `batch` partition
    * column dropped — write-side bookkeeping, not data). */
  def readIndexTables(s: SparkSession, baseDir: String)
      : (DataFrame, DataFrame) =
    (s.read.parquet(s"$baseDir/buckets").drop("batch"),
      s.read.parquet(s"$baseDir/codes").drop("batch"))

  /** Stream-written banded postings (vec_id, band, bucket) — consumed
    * by [[graft.pipeline.VecBackbone.compactBanded]]. */
  def readBandedPostings(s: SparkSession, baseDir: String): DataFrame =
    s.read.parquet(s"$baseDir/banded").drop("batch")

  /** The pinned geometry a stream-written index was built under, read
    * from its root sidecar — what [[graft.pipeline.VecBackbone.compactBanded]]
    * and every later probe must be handed, so the production seeded
    * geometry rides the full stream → compact → advance chain. Falls
    * back to the axis catalog geometry for pre-sidecar layouts. */
  def readBandedGeom(s: SparkSession, baseDir: String): BandedGeom =
    VecBackbone.readGeomSidecar(s, baseDir, memoize = false)
      .getOrElse(VecBackbone.CatalogGeom)
}
