package graft.streaming

import graft.pipeline.{Similarity, VecBackbone}
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
                                     planes: Int = VecBackbone.Planes): Unit = {
    val s = batch.sparkSession
    Similarity.register(s)
    val e = batch.select(col("vec_id"), col("embedding").cast("array<float>"))
    Similarity.signBuckets(s, e, planes)
      .write.mode("overwrite").parquet(s"$baseDir/buckets/batch=$batchId")
    // banded postings ride the same per-batch partition: the axis
    // geometry needs no driver probe (per-row validated), so this is
    // one more codegen'd projection per micro-batch, and the banded
    // compaction/advance consume stream-written postings exactly like
    // the batch-built ones (spec-pinned)
    Similarity.bandedSignBuckets(s, e, VecBackbone.Bands, planes)
      .write.mode("overwrite").parquet(s"$baseDir/banded/batch=$batchId")
    VecBackbone.encode(e, q)
      .write.mode("overwrite").parquet(s"$baseDir/codes/batch=$batchId")
  }

  /** The streaming query writer; caller sets checkpointLocation/trigger
    * and starts it. `q` is the pinned quantizer the whole index lives
    * under (load it once via `VecBackbone.quantizer`). */
  def indexWriter(docs: Dataset[VecEvent], baseDir: String,
                  q: VecBackbone.Quantizer,
                  planes: Int = VecBackbone.Planes)
      : DataStreamWriter[VecEvent] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[VecEvent], batchId: Long) =>
        writeIndexBatch(batch.toDF(), batchId, baseDir, q, planes)
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
}
