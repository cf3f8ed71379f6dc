package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Where a subject's wire events come from — the seam between the
  * reference's JetStream pull consumer (src/nats.rs:63-83) and Spark's
  * streaming sources. [[graft.streaming.Ingest.startFromBroker]] is
  * source-agnostic above this trait: every implementation yields rows
  * ALREADY TYPED to the subject's wire schema, and delivery semantics
  * come from Structured Streaming's checkpoint (offsets commit only
  * after the batch's writes land — the ack-after-insert contract,
  * src/handler.rs ack path ↔ checkpoint commit).
  */
trait BrokerSource {
  /** Typed streaming DataFrame for one subject. */
  def load(spark: SparkSession, subject: String, schema: StructType): DataFrame
}
// Implementations: [[FileBroker]] (directory tail), [[KafkaBroker]]
// (connector-gated), [[NatsBroker]] + [[NatsBridge]] (from-scratch NATS
// wire client + JetStream pull relay — the reference's actual broker).

/** Directory-tailing broker stand-in: one graft-proto flush directory per
  * subject (what the reference's micro-batcher writes per subject,
  * src/handler.rs:62-66). This is the implementation this environment can
  * run end-to-end. */
final case class FileBroker(wireRoot: String) extends BrokerSource {
  override def load(spark: SparkSession, subject: String, schema: StructType): DataFrame =
    spark.readStream.format("graft-proto")
      .option("schema", schema.toDDL)
      .load(s"$wireRoot/$subject")
}

/** Kafka broker source — the real-broker variant of the seam, mirroring
  * the reference's durable pull consumer config (src/nats.rs:63-83):
  *
  *   durable_name        → kafka.group.id (stable consumer identity)
  *   filter_subjects     → subscribe (subject == topic)
  *   AckPolicy::Explicit
  *     + ack-after-insert→ offsets commit at checkpoint AFTER foreachBatch
  *                         writes land (never broker-side auto-commit)
  *   max_bytes 5 MB/pull → maxOffsetsPerTrigger (offset-count cap; Kafka's
  *                         source has no byte cap — same envelope
  *                         approximation as O-T2, documented in SURVEY)
  *   max_deliver 3       → Spark task/stage retries + checkpoint replay
  *   ack_wait 120 s      → no analog needed: a crashed driver resumes from
  *                         the checkpoint instead of redelivering in-flight
  *
  * COMPILE-GATED, not env-gated: this class compiles against stock Spark
  * (the format is resolved by name at runtime), but running `load` needs
  * the spark-sql-kafka connector jar, which this environment does not
  * ship — absent the jar, `load` fails with a clear pointer instead of
  * Spark's generic DATA_SOURCE_NOT_FOUND. Option building is pure
  * ([[options]]) and spec-covered either way. */
final case class KafkaBroker(
    bootstrapServers: String,
    groupPrefix: String = "graft",
    startingOffsets: String = "earliest",
    maxOffsetsPerTrigger: Long = 100000L) extends BrokerSource {

  /** Reader options for one subject — pure, testable without the jar. */
  def options(subject: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> subject,
    "startingOffsets" -> startingOffsets,
    "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString,
    "kafka.group.id" -> s"$groupPrefix-$subject",
    // the ingest tier owns delivery: fail on lost offsets rather than
    // silently skipping a retention gap (workqueue discard=old analog
    // surfaces as a loud error here, not silent loss)
    "failOnDataLoss" -> "true")

  override def load(spark: SparkSession, subject: String, schema: StructType): DataFrame = {
    graft.functions.GraftExtensions.register(spark)
    // rewrap ONLY the source-not-found failure (missing connector jar) —
    // a real Kafka config/validation error must surface unchanged. The
    // message match is anchored to Spark's actual lookup error, and the
    // cause walk is depth-bounded (initCause permits cyclic chains).
    def isMissingSource(t: Throwable, depth: Int = 0): Boolean =
      t != null && depth < 16 && (
        t.isInstanceOf[ClassNotFoundException] ||
          Option(t.getMessage).exists(m =>
            m.contains("DATA_SOURCE_NOT_FOUND") ||
              m.contains("Failed to find the data source")) ||
          isMissingSource(t.getCause, depth + 1))
    val raw =
      try spark.readStream.format("kafka").options(options(subject)).load()
      catch {
        case e: Exception if isMissingSource(e) =>
          throw new IllegalStateException(
            "KafkaBroker needs the spark-sql-kafka connector on the classpath " +
              "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>); " +
              "this environment ships without it — use FileBroker for local runs", e)
      }
    // value = one length-UNdelimited proto3 message per Kafka record (the
    // record boundary does the framing) — decode with the native
    // expression, same codegen path as the envelope decoder
    raw.select(expr(s"proto_decode(value, '${schema.toDDL}')").as("decoded"))
      .select(col("decoded.*"))
  }
}

object KafkaBroker {
  /** Config-driven construction: broker host/port and consumer name from
    * the reference's [nats] section ([[graft.EngineConfig]]). */
  def fromConfig(cfg: graft.EngineConfig): KafkaBroker = KafkaBroker(
    bootstrapServers = s"${cfg.broker.host}:${cfg.broker.clientPort}",
    groupPrefix = cfg.broker.consumerName,
    maxOffsetsPerTrigger = cfg.batcher.maxRows)
}
