package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Operational surface of the reference's consumer loop re-expressed over
  * Structured Streaming:
  *
  *  - `Flushed {n} rows` progress logging (src/handler.rs:120) →
  *    [[FlushLog]], a StreamingQueryListener recording per-batch row
  *    counts and durations from the engine's own progress events.
  *  - ctrl-c → cancel token → flush_all → drain (src/main.rs:93-106,
  *    src/handler.rs:172-177) → [[Ops.drain]]: stop feeding, let the
  *    engine finish whatever is in flight, then stop the query.
  *    Checkpointing makes the drain safe at any point — a batch cut short
  *    is replayed on restart into its own idempotent `ingest_batch`
  *    partition (see [[Ingest]]), which is strictly stronger than the
  *    reference's at-least-once redelivery window (ack_wait=120s,
  *    src/nats.rs:71).
  */
object Ops {

  /** One micro-batch's ops record ("Flushed {n} rows" analog). */
  case class Flush(queryName: String, batchId: Long, rows: Long, durationMs: Long)

  /** Listener collecting per-batch flush records; attach with
    * [[Ops.withFlushLog]]. Thread-safe: progress events arrive on the
    * streaming listener bus thread. */
  final class FlushLog extends StreamingQueryListener {
    private val buf = new ConcurrentLinkedQueue[Flush]()
    @volatile private var started = 0
    @volatile private var terminated = 0

    override def onQueryStarted(event: QueryStartedEvent): Unit = started += 1
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = terminated += 1
    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val p = event.progress
      buf.add(Flush(Option(p.name).getOrElse(p.id.toString), p.batchId,
        p.numInputRows, p.batchDuration))
    }

    def flushes: Seq[Flush] = { import scala.jdk.CollectionConverters._; buf.iterator.asScala.toSeq }
    def totalRows: Long = flushes.map(_.rows).sum
    def startedCount: Int = started
    def terminatedCount: Int = terminated
  }

  /** Attach a fresh FlushLog to the session's listener bus and return it.
    * Remove with `spark.streams.removeListener`. */
  def withFlushLog(spark: SparkSession): FlushLog = {
    val log = new FlushLog
    spark.streams.addListener(log)
    log
  }

  /** Graceful drain (O-T7): process everything the source has already
    * seen, then stop. `processAllAvailable` is the flush_all analog —
    * it blocks until the sink is caught up with the source; `stop()`
    * then tears the query down with nothing in flight. */
  def drain(query: StreamingQuery): Unit = {
    query.processAllAvailable()
    query.stop()
    query.awaitTermination()
  }
}
