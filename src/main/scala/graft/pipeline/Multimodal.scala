package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media row: binary payload + typed metadata — the multimodal
  * column pattern (image/audio/video as `binary` with a mime tag). */
case class MediaRow(doc_id: Long, mime: String, media: Array[Byte])

/** Features extracted per media item. `thumb` stands in for a decoded
  * low-res representation (e.g. a 2x2 luma thumbnail / audio energy
  * bands); `n_frames` for frame-sampling of video payloads. */
case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
                         mean_byte: Double, byte_entropy: Double,
                         thumb: Array[Float], n_frames: Int)

/** Multimodal column processing for training-data pipelines.
  *
  * The decode step is a clearly-marked STUB: image/audio codec libraries
  * are not in this container, so `decodeStub` computes deterministic
  * byte-level statistics in place of a real decoder. Everything around
  * it — the binary column schema, the partition-preserving batched
  * `mapPartitions` execution (the Scala analog of a Pandas-UDF batch:
  * decode wants amortized per-batch setup, e.g. a codec context or GPU
  * handle), and the typed output schema — is the real pipeline and is
  * what the tests exercise. Swapping in a real decoder changes only the
  * body of `decodeStub`.
  */
object Multimodal {

  /** Interpret `documents` as a multimodal table: text bytes stand in
    * for media payloads; mime derived from source. */
  def asMedia(docs: DataFrame): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    docs.select(col("doc_id"),
        when(col("source") === "src0", "image/png")
          .when(col("source") === "src1", "audio/wav")
          .otherwise("video/mp4").as("mime"),
        col("text").cast("binary").as("media"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic byte statistics in place of a codec.
    * A real implementation would decode pixels/samples here. */
  private[pipeline] def decodeStub(bytes: Array[Byte]): (Double, Double, Array[Float]) = {
    if (bytes.isEmpty) return (0.0, 0.0, Array.fill(4)(0f))
    val hist = new Array[Int](256)
    var sum = 0L
    bytes.foreach { b => val u = b & 0xff; hist(u) += 1; sum += u }
    val n = bytes.length.toDouble
    var entropy = 0.0
    hist.foreach { c =>
      if (c > 0) { val p = c / n; entropy -= p * math.log(p) / math.log(2.0) }
    }
    // "thumbnail": mean byte value of each quarter of the payload.
    val q = math.max(1, bytes.length / 4)
    val thumb = (0 until 4).map { i =>
      val slice = bytes.slice(i * q, math.min((i + 1) * q, bytes.length))
      if (slice.isEmpty) 0f
      else (slice.map(_ & 0xff).sum.toFloat / slice.length / 255f)
    }.toArray
    (sum / n, entropy, thumb)
  }

  /** Frame-sample stride for video payloads (every `stride` bytes stands
    * in for every k-th frame). */
  private def frameCount(mime: String, len: Int, stride: Int = 256): Int =
    if (mime.startsWith("video/")) math.max(1, len / stride) else 1

  /** Batched feature extraction. Batches inside each partition mirror
    * the batch shape a real decoder needs (vectorized codec / model
    * inference); partitioning of the input is preserved — no shuffle. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec context, model handle)
        batch.iterator.map { r =>
          val (mean, entropy, thumb) = decodeStub(r.media)
          MediaFeatures(r.doc_id, r.mime, r.media.length, mean, entropy,
            thumb, frameCount(r.mime, r.media.length))
        }
      }
    }
  }

  type Q = (SparkSession, String) => DataFrame

  /** Rows-only query entry (binary + mapPartitions is not oracle-SQL
    * expressible; MultimodalSpec checks the feature semantics). */
  val queries: Map[String, Q] = Map(
    "d_media_features" -> ((s, d) => {
      extractFeatures(asMedia(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          round(col("mean_byte"), 6).as("mean_byte"),
          round(col("byte_entropy"), 6).as("byte_entropy"),
          col("n_frames"))
        .orderBy("doc_id")
    })
  )
}
