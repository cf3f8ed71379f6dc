package graft.streaming

import java.sql.Timestamp
import graft.TestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingAggSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val h0 = 1726300800000L // aligned hour

  private def ts(offsetMin: Long) = new Timestamp(h0 + offsetMin * 60000)

  test("tumbling hourly counts with watermark drops late data (O-T8/T11)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(String, String, Timestamp)]
    val df = ms.toDF().toDF("event_name", "user_id", "timestamp")
    val q = StreamingAgg.hourlyCounts(df, watermark = "10 minutes")
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()

    // hour 0: three events, two users
    ms.addData(("login", "u1", ts(5)), ("login", "u2", ts(20)), ("watch", "u1", ts(40)))
    q.processAllAvailable()
    // advance event time to hour 3 ⇒ watermark = 3h - 10min ⇒ hour-0 and
    // hour-1 windows close and emit
    ms.addData(("login", "u9", ts(185)))
    q.processAllAvailable()
    // a late hour-0 event, far behind the watermark ⇒ dropped
    ms.addData(("login", "u3", ts(50)))
    q.processAllAvailable()
    // push watermark far ahead so everything else emits too
    ms.addData(("login", "u9", ts(600)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("hourly_out")
      .select(col("hour"), col("event_name"), col("n"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
      .toSet
    // hour 0 closed with the ORIGINAL three events; the late u3 login is
    // NOT counted (would be n=3 logins otherwise)
    assert(out.contains((h0, "login", 2L)), s"unexpected: $out")
    assert(out.contains((h0, "watch", 1L)))
    // the NEGATIVE half must be asserted too: if the late event
    // re-created hour-0 state, it would surface as an ADDITIONAL
    // (h0, login, 1) append row when the final event advanced the
    // watermark — contains() alone would still pass
    assert(out.count { case (h, n, _) => h == h0 && n == "login" } == 1,
      s"late hour-0 login must not emit a second hour-0 row: $out")
  }

  test("query progress is observable and stop() drains cleanly (O-T7)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val progressed = new java.util.concurrent.atomic.AtomicInteger(0)
    val terminated = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        progressed.incrementAndGet()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        terminated.set(true)
    }
    spark.streams.addListener(listener)
    try {
      val ms = MemoryStream[(String, Timestamp)]
      val q = StreamingAgg.gapSessions(ms.toDF().toDF("user_id", "timestamp"))
        .writeStream.format("memory").queryName("drain_out")
        .outputMode("append").start()
      ms.addData(("u1", ts(0)))
      q.processAllAvailable()
      q.stop() // graceful drain (ctrl-c → flush_all analog, src/main.rs:93-106)
      q.awaitTermination(30000)
      // listener events are async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (!(terminated.get && progressed.get > 0) && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(progressed.get > 0, "no progress events observed")
      assert(terminated.get, "no termination event observed")
    } finally spark.streams.removeListener(listener)
  }

  test("streaming gap sessions close on inactivity (O-T10)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(String, Timestamp)]
    val df = ms.toDF().toDF("user_id", "timestamp")
    val q = StreamingAgg.gapSessions(df, gap = "30 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    // one burst (3 events within 20 min), then silence, then a new burst
    ms.addData(("u1", ts(0)), ("u1", ts(10)), ("u1", ts(20)))
    q.processAllAvailable()
    ms.addData(("u1", ts(120)), ("u1", ts(125)))
    q.processAllAvailable()
    ms.addData(("u1", ts(600))) // advance watermark, close everything prior
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sess_out")
      .select("user_id", "n_events").collect()
      .map(r => (r.getString(0), r.getLong(1))).toList.sorted
    assert(sessions.contains(("u1", 3L)), s"first burst session missing: $sessions")
    assert(sessions.contains(("u1", 2L)), s"second burst session missing: $sessions")
  }
}
