package graft.pipeline

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Shuffle-volume audit — the measurement behind SCALE.md's capacity
  * model: per catalog key, the bytes a run actually moves (input read,
  * shuffle write, shuffle read) and the peak per-task execution memory,
  * summed over all tasks via a listener. Shuffle bytes are what dies
  * first at 100 TB, so the capacity table extrapolates THESE, not wall
  * times.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "Test/runMain graft.pipeline.ShuffleAudit d_dedup_exact ..."
  *
  * Each key runs twice; the second (warm — stores/memos built) run is
  * reported, matching how the bench measures steady state. Listener
  * delivery is async, so counters are read after they stabilize.
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("d_dedup_exact", "d_curation_apply", "d_shard_manifest",
        "d_shard_delta", "d_token_budget", "o_a1_hashagg", "o_j1_inner")
    val spark = graft.EngineSession.local(32, "shuffle-audit")
    val input = new AtomicLong; val sw = new AtomicLong
    val sr = new AtomicLong; val peak = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          input.addAndGet(m.inputMetrics.bytesRead)
          sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          peak.getAndAccumulate(m.peakExecutionMemory, math.max)
        }
      }
    })
    def settle(): (Long, Long, Long, Long) = {
      // listener events arrive async: require two consecutive still
      // reads, and say so loudly if the deadline (not stability) ends
      // the wait — a truncated counter must not read as "moves nothing"
      var still = 0
      var last = (-1L, -1L, -1L, -1L)
      var now = (input.get, sw.get, sr.get, peak.get)
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      while (still < 2 && System.nanoTime < deadline) {
        if (now == last) still += 1 else still = 0
        last = now; Thread.sleep(300); now = (input.get, sw.get, sr.get, peak.get)
      }
      if (still < 2) println(
        "[shuffle-audit] WARNING: listener did not settle; counters may be truncated")
      now
    }
    def mb(b: Long): String = f"${b / 1048576.0}%.1f"
    qs.foreach { q =>
      graft.SparkEntry.queries(q)(spark, sf).count() // build stores, JIT
      settle()
      input.set(0); sw.set(0); sr.set(0); peak.set(0)
      val t0 = System.nanoTime
      val rows = graft.SparkEntry.queries(q)(spark, sf).count()
      val sec = (System.nanoTime - t0) / 1e9
      val (i, w, r, p) = settle()
      println(f"[shuffle-audit] $q%-24s rows=$rows%-8d sec=$sec%.2f " +
        s"input=${mb(i)}MB shufW=${mb(w)}MB shufR=${mb(r)}MB " +
        s"peakTask=${mb(p)}MB")
    }
    spark.stop()
  }
}
