package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.util.LongAccumulator

import graft.functions.ParametricAgg

/** Pre-failure observability for the streaming twins (r17 VERDICT #5) —
  * the streaming counterpart of the batch `max_group_events` gauge
  * ([[graft.sources.QueryLog]]): the `flatMapGroupsWithState` twins fold
  * their per-user state on executor tasks, where a hot group and its
  * dropped-late events are invisible from the driver until something
  * breaks. Two cluster-correct figures, surfaced per trigger:
  *
  *  - `max_group_events` — the per-trigger high-water mark of events one
  *    group folded in a single trigger INCLUDING the carried tie-group
  *    frontier (the twins' state is O(1) by design, so the exposure is
  *    the fan-in per group per trigger, not a growing buffer — the same
  *    "how hot does one user run" question the batch gauge answers).
  *  - `late_drops_total` — cumulative count of events dropped as late
  *    (strictly behind a consumed frontier) by the in-order twins
  *    ([[EventAggStream.seqCountUpdates]], [[SeqMatchStream]]), making
  *    the documented late-drop trade observable instead of silent.
  *
  * Mechanics mirror [[ParametricAgg]]: the twins acquire the shared
  * accumulators driver-side at stream construction and ship them in the
  * task closure; executors fold, the driver merges on task end. A
  * [[StreamingQueryListener]] snapshots both on every
  * `QueryProgressEvent` — the per-trigger reporting channel the VERDICT
  * asks for — reading-and-resetting the max so each row carries THAT
  * trigger's high-water, and leaving the late counter cumulative (a
  * monotone ops counter; deltas are a subtraction away). Under
  * concurrent streaming queries the figures attribute to whichever
  * trigger's callback reads first (one shared gauge, the single-analyst
  * caveat [[ParametricAgg.peakAndReset]] states). */
object StreamGauges {

  /** One trigger's reading. `event_ms` is the driver callback time. */
  final case class TriggerGauge(query_id: String, run_id: String,
                                batch_id: Long, event_ms: Long,
                                max_group_events: Long,
                                late_drops_total: Long)

  @volatile private var peakAcc: ParametricAgg.MaxAccumulator = null
  @volatile private var lateAcc: LongAccumulator = null
  @volatile private var accApp: String = null

  /** Driver-side lazy registration (one pair per SparkContext, the
    * [[ParametricAgg.acquire]] lifecycle); null off-driver, which the
    * note* helpers tolerate. */
  def acquire(): (ParametricAgg.MaxAccumulator, LongAccumulator) =
    synchronized {
      SparkSession.getActiveSession
        .orElse(SparkSession.getDefaultSession) match {
        case Some(sp) if !sp.sparkContext.isStopped =>
          val sc = sp.sparkContext
          if (peakAcc == null || accApp != sc.applicationId) {
            peakAcc = new ParametricAgg.MaxAccumulator
            lateAcc = new LongAccumulator
            sc.register(peakAcc, "graft.stream.maxGroupEventsPerTrigger")
            sc.register(lateAcc, "graft.stream.lateDropsTotal")
            accApp = sc.applicationId
          }
          (peakAcc, lateAcc)
        case _ => (null, null)
      }
    }

  /** Fold a group's per-trigger event fan-in into the high-water mark. */
  def noteGroupEvents(acc: ParametricAgg.MaxAccumulator, n: Int): Unit =
    if (acc != null && n > 0) acc.add(n.toLong)

  /** Count events dropped as late behind a consumed frontier. */
  def noteLate(acc: LongAccumulator, n: Int): Unit =
    if (acc != null && n > 0) acc.add(n.toLong)

  /** Current cumulative late-drop count (0 when nothing registered). */
  def lateDropsTotal: Long = {
    val a = lateAcc
    if (a == null) 0L else a.value
  }

  /** The per-trigger reporter. Bounded ring (oldest evicted), the
    * [[graft.sources.QueryLog]] retention discipline. */
  final class Listener(capacity: Int = 1024) extends StreamingQueryListener {
    private val entries = new ConcurrentLinkedQueue[TriggerGauge]()
    private val count = new AtomicInteger(0)

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val peak = {
        val a = peakAcc
        if (a == null) 0L else { val v = a.value; a.reset(); v }
      }
      entries.add(TriggerGauge(p.id.toString, p.runId.toString, p.batchId,
        System.currentTimeMillis(), peak, lateDropsTotal))
      if (count.incrementAndGet() > capacity) {
        if (entries.poll() != null) count.decrementAndGet(): Unit
      }
    }

    def snapshot: Seq[TriggerGauge] = {
      val b = Seq.newBuilder[TriggerGauge]
      entries.forEach(g => b += g)
      b.result()
    }

    /** `system_stream_gauges`-shaped view of the ring. */
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      snapshot.toDF()
    }
  }

  /** Install on the session's stream manager; returns the listener for
    * [[Listener.toDF]] / removal via `spark.streams.removeListener`. */
  def install(spark: SparkSession, capacity: Int = 1024): Listener = {
    val l = new Listener(capacity)
    spark.streams.addListener(l)
    l
  }
}
