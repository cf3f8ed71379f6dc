package graft.streaming

import java.sql.Timestamp

import graft.TestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twins of the `retention` and `sequence_count` SQL
  * aggregates ([[EventAggStream]]): streamed == the batch aggregate
  * across random micro-batch cuts, and across a checkpoint restart. */
class EventAggStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val t0 = 1726300800000L
  private def ts(min: Long) = new Timestamp(t0 + min * 60000)
  private val types = Seq("signup", "click", "purchase", "view")

  test("retention stream == retention SQL aggregate across random cuts (any order)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    graft.functions.GraftExtensions.register(spark)
    val conds = Seq[FunnelEvent => Boolean](
      _.event_type == "signup", _.event_type == "click",
      _.event_type == "purchase")
    (0 until 3).foreach { draw =>
      val rnd = new scala.util.Random(1711 + draw)
      // sparse: ~3 events/user so flag patterns actually vary
      val log = (0 until 150).map { _ =>
        FunnelEvent(rnd.nextInt(50).toLong, types(rnd.nextInt(types.size)),
          ts(rnd.nextInt(2000)))
      }
      // the bitmask OR is commutative+idempotent: NO in-order requirement,
      // so feed the log UNSORTED — arrival order must not matter
      val ms = MemoryStream[FunnelEvent]
      val name = s"ret_stream_$draw"
      val q = EventAggStream.retentionUpdates(ms.toDS(), conds)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      var rest = log
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(70)
        ms.addData(rest.take(n): _*); q.processAllAvailable()
        rest = rest.drop(n)
      }
      q.stop()
      // flags are element-wise monotone: latest = element-wise max
      val streamed = spark.table(name)
        .selectExpr("user_id", "flags[0] AS r0", "flags[1] AS r1",
          "flags[2] AS r2")
        .groupBy("user_id")
        .agg(max("r0").as("r0"), max("r1").as("r1"), max("r2").as("r2"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2),
          r.getInt(3))).toMap
      val batch = log.toDF("user_id", "event_type", "ts")
        .groupBy("user_id")
        .agg(expr("retention(event_type = 'signup', " +
          "event_type = 'click', event_type = 'purchase')").as("r"))
        .collect().map(r => r.getLong(0) ->
          { val a = r.getSeq[Int](1); (a(0), a(1), a(2)) }).toMap
      // streamed has entries only for users with some condition match;
      // batch lists every user (all-zero flags for pure drive-bys)
      val batchNonZero = batch.filter(_._2 != ((0, 0, 0)))
      assert(streamed.filter(_._2 != ((0, 0, 0))) == batchNonZero,
        s"draw $draw retention diverged")
      assert(batchNonZero.nonEmpty && batchNonZero.values.toSet.size >= 2,
        s"draw $draw should discriminate flag patterns")
    }
  }

  test("sequence_count stream == SQL aggregate across random cuts (tied, in order)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    graft.functions.GraftExtensions.register(spark)
    val first = (e: TaggedEvent) => e.event_type == "signup"
    val second = (e: TaggedEvent) => e.event_type == "purchase"
    Seq(0L, 12L * 3600 * 1000000).foreach { wUs =>
      (0 until 3).foreach { draw =>
        val rnd = new scala.util.Random(1721 + draw)
        // 30-min grid: ties occur and split across cuts; tie = index
        val log = (0 until 300).map { i =>
          TaggedEvent(rnd.nextInt(12).toLong, types(rnd.nextInt(types.size)),
            ts(rnd.nextInt(96) * 30L), i.toLong)
        }.sortBy(e => (e.ts.getTime, e.tie)) // IN-ORDER: the exactness contract
        val ms = MemoryStream[TaggedEvent]
        val name = s"sc_stream_${wUs}_$draw"
        val q = EventAggStream.seqCountUpdates(ms.toDS(), first, second, wUs)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        var rest = log
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(60)
          ms.addData(rest.take(n): _*); q.processAllAvailable()
          rest = rest.drop(n)
        }
        q.stop()
        val streamed = spark.table(name)
          .groupBy("user_id").agg(max("seq_count").as("c"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val batch = log.toDF("user_id", "event_type", "ts", "tie")
          .filter(col("event_type").isin("signup", "purchase"))
          .groupBy("user_id")
          .agg(expr(s"sequence_count($wUs, ts, tie, " +
            "event_type = 'signup', event_type = 'purchase')").as("c"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val batchPos = batch.filter(_._2 > 0)
        assert(streamed == batchPos,
          s"w=$wUs draw $draw: streamed $streamed != batch $batchPos")
        assert(batchPos.nonEmpty, s"w=$wUs draw $draw should fire pairs")
      }
    }
  }

  test("late events are dropped, never recounted (the documented trade)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val lateBefore = StreamGauges.lateDropsTotal
    val ms = MemoryStream[TaggedEvent]
    val q = EventAggStream.seqCountUpdates(ms.toDS(),
        _.event_type == "signup", _.event_type == "purchase")
      .writeStream.format("memory").queryName("sc_late")
      .outputMode("append").start()
    ms.addData(TaggedEvent(1, "signup", ts(10), 1),
      TaggedEvent(1, "purchase", ts(20), 2))
    q.processAllAvailable()
    // behind the frontier: would have armed a second pair in a full
    // re-sort, but O(1) state cannot replay history — dropped
    ms.addData(TaggedEvent(1, "signup", ts(5), 0))
    q.processAllAvailable()
    ms.addData(TaggedEvent(1, "purchase", ts(30), 3))
    q.processAllAvailable()
    q.stop()
    val counts = spark.table("sc_late")
      .groupBy("user_id").agg(max("seq_count"))
      .collect().map(_.getLong(1)).toSeq
    assert(counts == Seq(1L), s"late signup must not re-arm: $counts")
    // the trade is observable, not silent: exactly the one dropped
    // matching event lands on the StreamGauges late counter
    assert(StreamGauges.lateDropsTotal - lateBefore == 1L,
      "the late signup must count on the late-drop gauge")
  }

  test("both twins survive a checkpoint restart mid-stream") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(1731)
    val log = (0 until 200).map { i =>
      TaggedEvent(rnd.nextInt(8).toLong, types(rnd.nextInt(types.size)),
        ts(rnd.nextInt(96) * 30L), i.toLong)
    }.sortBy(e => (e.ts.getTime, e.tie))
    val (a, b) = log.splitAt(120)
    val inDir = java.nio.file.Files.createTempDirectory("eas_in").toString
    val scOut = java.nio.file.Files.createTempDirectory("eas_sc").toString
    val rOut = java.nio.file.Files.createTempDirectory("eas_r").toString
    val scCkpt = java.nio.file.Files.createTempDirectory("eas_sc_ck").toString
    val rCkpt = java.nio.file.Files.createTempDirectory("eas_r_ck").toString
    def startBoth() = {
      val src = spark.readStream
        .schema(Seq.empty[TaggedEvent].toDS().schema)
        .parquet(inDir).as[TaggedEvent]
      val q1 = EventAggStream.seqCountUpdates(src,
          _.event_type == "signup", _.event_type == "purchase")
        .writeStream.format("parquet").option("path", scOut)
        .option("checkpointLocation", scCkpt).outputMode("append").start()
      val q2 = EventAggStream.retentionUpdates(
          src.map(e => FunnelEvent(e.user_id, e.event_type, e.ts)),
          Seq(_.event_type == "signup", _.event_type == "purchase"))
        .writeStream.format("parquet").option("path", rOut)
        .option("checkpointLocation", rCkpt).outputMode("append").start()
      (q1, q2)
    }
    a.toDS().repartition(2).write.mode("append").parquet(inDir)
    val (q1a, q2a) = startBoth()
    q1a.processAllAvailable(); q2a.processAllAvailable()
    q1a.stop(); q2a.stop() // simulated crash: state lives in the checkpoints
    b.toDS().repartition(2).write.mode("append").parquet(inDir)
    val (q1b, q2b) = startBoth()
    q1b.processAllAvailable(); q2b.processAllAvailable()
    q1b.stop(); q2b.stop()
    val scStreamed = spark.read.parquet(scOut)
      .groupBy("user_id").agg(max("seq_count").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scBatch = log.toDF("user_id", "event_type", "ts", "tie")
      .filter(col("event_type").isin("signup", "purchase"))
      .groupBy("user_id")
      .agg(expr("sequence_count(0, ts, tie, event_type = 'signup', " +
        "event_type = 'purchase')").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      .filter(_._2 > 0)
    assert(scStreamed == scBatch, "sequence_count restart diverged")
    val rStreamed = spark.read.parquet(rOut)
      .selectExpr("user_id", "flags[0] AS r0", "flags[1] AS r1")
      .groupBy("user_id").agg(max("r0").as("r0"), max("r1").as("r1"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val rBatch = log.toDF("user_id", "event_type", "ts", "tie")
      .groupBy("user_id")
      .agg(expr("retention(event_type = 'signup', " +
        "event_type = 'purchase')").as("r"))
      .collect().map(r => r.getLong(0) ->
        { val x = r.getSeq[Int](1); (x(0), x(1)) }).toMap
      .filter(_._2 != ((0, 0)))
    assert(rStreamed.filter(_._2 != ((0, 0))) == rBatch,
      "retention restart diverged")
  }
}
