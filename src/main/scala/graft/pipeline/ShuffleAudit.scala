package graft.pipeline

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Shuffle-volume audit — the measurement behind SCALE.md's capacity
  * model: per catalog key, the bytes a run actually moves (input read,
  * shuffle write, shuffle read) and the peak per-task execution memory,
  * summed over all tasks via a listener. Shuffle bytes are what dies
  * first at 100 TB, so the capacity table extrapolates THESE, not wall
  * times — and unlike wall times they are load-INSENSITIVE, which makes
  * them the regression tripwire: a key whose shuffle-write bytes grow
  * super-linearly across sf0.01→sf0.1 has reintroduced a corpus-sized
  * exchange regardless of how the host was loaded
  * (`tools/shuffle_gate.py` adjudicates the two-SF ratio as a soft gate
  * stage, persisted as `SHUFFLE_r<N>.json` next to the bench records).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     java -cp <jar>:<spark-jars> graft.pipeline.ShuffleAudit \
  *       [--json out.json] [key ...]        # no keys = the full catalog
  *
  * Each key runs twice; the second (warm — stores/memos built) run is
  * reported, matching how the bench measures steady state. Listener
  * delivery is async, so counters are read after they stabilize.
  */
object ShuffleAudit {

  /** The audit's measurement core, reusable outside [[main]] (ScaleSmoke's
    * capacity-decade sweep): task-metric accumulation via a listener,
    * with per-pass reset and async-delivery settling. */
  private[graft] final class Meter(spark: org.apache.spark.sql.SparkSession) {
    private val input = new AtomicLong; private val sw = new AtomicLong
    private val sr = new AtomicLong; private val peak = new AtomicLong
    private val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          input.addAndGet(m.inputMetrics.bytesRead)
          sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          peak.getAndAccumulate(m.peakExecutionMemory, math.max)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    /** Unregister — a sweep that creates one Meter per multiplier must
      * not leave prior meters accumulating on the listener bus. */
    def detach(): Unit = spark.sparkContext.removeSparkListener(listener)
    /** Zero every counter INCLUDING the peak-memory max, after settling
      * the async bus — without the settle a late warm-run TaskEnd could
      * land post-clear and attribute warm-pass peak (or bytes) to the
      * measured pass (the SkewMeter reset contract; closes the r14/r15
      * "peak attributable to the measured pass" nit). */
    def reset(): Unit = {
      settle(); input.set(0); sw.set(0); sr.set(0); peak.set(0)
    }
    /** (input, shuffleWrite, shuffleRead, peakTask) after the async
      * listener queue stabilizes — two consecutive still reads, or a
      * loud warning if the deadline ends the wait (a truncated counter
      * must not read as "moves nothing"). */
    def settle(): (Long, Long, Long, Long) = {
      var still = 0
      var last = (-1L, -1L, -1L, -1L)
      var now = (input.get, sw.get, sr.get, peak.get)
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      while (still < 2 && System.nanoTime < deadline) {
        if (now == last) still += 1 else still = 0
        last = now; Thread.sleep(300)
        now = (input.get, sw.get, sr.get, peak.get)
      }
      if (still < 2) println(
        "[shuffle-audit] WARNING: listener did not settle; counters may be truncated")
      now
    }
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jsonOut = args.sliding(2).collectFirst {
      case Array("--json", p) => p
    }
    require(!args.contains("--json") || jsonOut.isDefined,
      "--json needs a path argument (a full-catalog run that then writes " +
        "nothing is a wasted audit)")
    val keyArgs = {
      val b = Seq.newBuilder[String]
      var skip = false
      args.foreach { a =>
        if (skip) skip = false
        else if (a == "--json") skip = true
        else b += a
      }
      b.result()
    }
    val qs = if (keyArgs.nonEmpty) keyArgs
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.EngineSession.local(32, "shuffle-audit")
    val meter = new Meter(spark)
    def mb(b: Long): String = f"${b / 1048576.0}%.1f"
    // one-time stores built up front (the same prebuild Bench does), so
    // even each key's FIRST pass is warm and the measured second pass
    // never includes a neighbor's store build
    Backbone.prebuild(spark, sf)
    VecBackbone.prebuild(spark, sf)
    EndToEnd.prebuild(spark, sf)
    val results = qs.flatMap { q =>
      try {
        graft.SparkEntry.queries(q)(spark, sf).count() // warm run: JIT, caches
        meter.reset() // settles internally

        val t0 = System.nanoTime
        val rows = graft.SparkEntry.queries(q)(spark, sf).count()
        val sec = (System.nanoTime - t0) / 1e9
        val (i, w, r, p) = meter.settle()
        println(f"[shuffle-audit] $q%-24s rows=$rows%-8d sec=$sec%.2f " +
          s"input=${mb(i)}MB shufW=${mb(w)}MB shufR=${mb(r)}MB " +
          s"peakTask=${mb(p)}MB")
        Some(q -> (rows, sec, i, w, r, p))
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[shuffle-audit] $q ERROR: ${e.getMessage}")
          None
      }
    }
    jsonOut.foreach { path =>
      val body = results.map { case (q, (rows, sec, i, w, r, p)) =>
        f""""$q":{"rows":$rows,"sec":$sec%.3f,"input_b":$i,""" +
          s""""shuffle_write_b":$w,"shuffle_read_b":$r,"peak_task_b":$p}"""
      }.mkString(",")
      val json = s"""{"sf":"$sf","n_keys":${results.size},""" +
        s"""${graft.BootInfo.jsonFields},"keys":{$body}}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        json.getBytes("UTF-8"))
      println(s"[shuffle-audit] wrote $path (${results.size} keys)")
    }
    spark.stop()
  }
}
