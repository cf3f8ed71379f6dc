package graft.streaming

import java.sql.Timestamp

import graft.TestSession
import graft.functions.SequenceMatchPattern
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twin of the `sequence_match` pattern aggregate
  * ([[SeqMatchStream]]): the online DP == the batch DP on every prefix,
  * streamed == the batch SQL aggregate across random micro-batch cuts
  * (ties straddling cuts included) and across a checkpoint restart, the
  * late-drop trade is observable on [[StreamGauges]], and the
  * unstreamable grammar corner fails loudly. */
class SeqMatchStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val t0 = 1726300800000L
  private def ts(min: Long) = new Timestamp(t0 + min * 60000)
  private val types = Seq("signup", "click", "purchase", "view")

  // the grammar tour: adjacent, any-run, fixed skip, time gaps on both
  // separator kinds, negation on both separator kinds
  private val patterns = Seq(
    "(?1)(?2)",
    "(?1).*(?2)",
    "(?1)(?t<=3600)(?2)",
    "(?1)..(?2)",
    "(?1)(?!3).*(?2)",
    "(?1)(?!3)..(?2)",
    "(?1)(?t>=1800).*(?2).(?3)",
    "(?1)(?t==1800)(?2)", // fixed-offset == gap streams (one ring slot)
    "(?1).*(?2)(?!1)(?3)")

  test("online DP == batch DP on every prefix of random streams") {
    patterns.foreach { p =>
      val steps = SequenceMatchPattern.parse(p, 3)
      (0 until 25).foreach { draw =>
        val rnd = new scala.util.Random(1800 + draw)
        // raw BIGINT time units (unitMicros = 1): gaps land on the
        // pattern bounds; ties happen (grid of 12 values, 30 apart)
        val evs = (0 until 30).map { i =>
          (rnd.nextInt(12) * 1800L, i.toLong, 1 + rnd.nextInt(7))
        }.sortBy(t => (t._1, t._2))
        val dp = new SeqMatchStream.Dp(steps.length,
          SeqMatchStream.maxOffset(steps))
        dp.agg = SeqMatchStream.initAgg(steps)
        val batchState = new SequenceMatchPattern.State
        evs.zipWithIndex.foreach { case ((us, tie, mask), i) =>
          SeqMatchStream.consume(dp, steps, 1L, us, mask)
          batchState.add(us, tie, mask)
          val batch = SequenceMatchPattern.matches(batchState, steps, 1L)
          // monotone truth: online matched is sticky; batch recomputes —
          // they must agree at every prefix because feasibility never
          // revokes (events only append in (ts, tie) order)
          assert(dp.matched == batch,
            s"pattern '$p' draw $draw prefix ${i + 1}: online ${dp.matched} " +
              s"!= batch $batch (events ${evs.take(i + 1)})")
        }
      }
    }
  }

  test("streamed == batch SQL aggregate across random cuts (tied, in order)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    graft.functions.GraftExtensions.register(spark)
    val conds = Seq[TaggedEvent => Boolean](
      _.event_type == "signup", _.event_type == "purchase",
      _.event_type == "click")
    patterns.foreach { p =>
      (0 until 2).foreach { draw =>
        val rnd = new scala.util.Random(1850 + draw + p.hashCode % 97)
        // 30-min grid: ties occur and split across cuts; tie = index
        val log = (0 until 300).map { i =>
          TaggedEvent(rnd.nextInt(12).toLong, types(rnd.nextInt(types.size)),
            ts(rnd.nextInt(96) * 30L), i.toLong)
        }.sortBy(e => (e.ts.getTime, e.tie)) // IN-ORDER: the contract
        val ms = MemoryStream[TaggedEvent]
        val name = s"sm_${math.abs(p.hashCode)}_$draw"
        val q = SeqMatchStream.seqMatchUpdates(ms.toDS(), p, conds)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        var rest = log
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(60)
          ms.addData(rest.take(n): _*); q.processAllAvailable()
          rest = rest.drop(n)
        }
        q.stop()
        val updates = spark.table(name).collect()
        // matched is terminal: at most one update per user, all true
        assert(updates.map(_.getLong(0)).distinct.length == updates.length,
          s"'$p' draw $draw: a user emitted twice")
        assert(updates.forall(_.getBoolean(1)))
        val streamed = updates.map(_.getLong(0)).toSet
        val batch = log.toDF("user_id", "event_type", "ts", "tie")
          .groupBy("user_id")
          .agg(expr(s"sequence_match('$p', ts, tie, " +
            "event_type = 'signup', event_type = 'purchase', " +
            "event_type = 'click')").as("m"))
          .collect().filter(_.getBoolean(1)).map(_.getLong(0)).toSet
        assert(streamed == batch,
          s"'$p' draw $draw: streamed $streamed != batch $batch")
      }
    }
  }

  test("survives a checkpoint restart mid-stream") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    val p = "(?1)(?!3).*(?2)"
    val conds = Seq[TaggedEvent => Boolean](
      _.event_type == "signup", _.event_type == "purchase",
      _.event_type == "click")
    val rnd = new scala.util.Random(1881)
    val log = (0 until 200).map { i =>
      TaggedEvent(rnd.nextInt(8).toLong, types(rnd.nextInt(types.size)),
        ts(rnd.nextInt(96) * 30L), i.toLong)
    }.sortBy(e => (e.ts.getTime, e.tie))
    val (a, b) = log.splitAt(120)
    val inDir = java.nio.file.Files.createTempDirectory("sm_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("sm_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sm_ck").toString
    def start() = {
      val src = spark.readStream
        .schema(Seq.empty[TaggedEvent].toDS().schema)
        .parquet(inDir).as[TaggedEvent]
      SeqMatchStream.seqMatchUpdates(src, p, conds)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }
    a.toDS().repartition(2).write.mode("append").parquet(inDir)
    val q1 = start()
    q1.processAllAvailable(); q1.stop() // crash: state in the checkpoint
    b.toDS().repartition(2).write.mode("append").parquet(inDir)
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val streamed = spark.read.parquet(outDir)
      .collect().map(_.getLong(0)).toSet
    val batch = log.toDF("user_id", "event_type", "ts", "tie")
      .groupBy("user_id")
      .agg(expr(s"sequence_match('$p', ts, tie, " +
        "event_type = 'signup', event_type = 'purchase', " +
        "event_type = 'click')").as("m"))
      .collect().filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    assert(streamed == batch, s"restart diverged: $streamed != $batch")
    assert(batch.nonEmpty, "the draw should produce matches")
  }

  test("late events drop, count on the gauge; per-trigger high-water reported") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val gauges = StreamGauges.install(spark)
    try {
      val lateBefore = StreamGauges.lateDropsTotal
      // earlier tests ran twins with no listener installed, so the max
      // accumulator still holds their residue — zero it so trigger 1's
      // reading is exactly this stream's high-water
      StreamGauges.acquire()._1.reset()
      val ms = MemoryStream[TaggedEvent]
      val q = SeqMatchStream.seqMatchUpdates(ms.toDS(), "(?1).*(?2)",
        Seq(_.event_type == "signup", _.event_type == "purchase"))
        .writeStream.format("memory").queryName("sm_late")
        .outputMode("append").start()
      // trigger 1: user 1 folds 7 matching events (the hot group),
      // user 2 folds 2 — high-water 7; no purchase yet, no match
      ms.addData(
        (0 until 7).map(i =>
          TaggedEvent(1, "signup", ts(100 + i), i.toLong)) :+
          TaggedEvent(2, "signup", ts(100), 100L) :+
          TaggedEvent(2, "view", ts(101), 101L): _*)
      q.processAllAvailable()
      // trigger 2: two late matching events (behind user 1's frontier)
      // drop and count; one in-order purchase completes the match
      ms.addData(TaggedEvent(1, "signup", ts(1), 200L),
        TaggedEvent(1, "purchase", ts(2), 201L),
        TaggedEvent(1, "purchase", ts(300), 202L))
      q.processAllAvailable()
      q.stop()
      assert(spark.table("sm_late").collect().map(_.getLong(0)).toSeq
        == Seq(1L), "the in-order purchase must still match")
      assert(StreamGauges.lateDropsTotal - lateBefore == 2L,
        "exactly the two late matching events count as drops")
      // the listener reports per-trigger rows for THIS query with the
      // trigger-1 high-water visible (callbacks are async: poll briefly)
      val qid = q.id.toString
      val deadline = System.currentTimeMillis() + 15000
      var rows = Seq.empty[StreamGauges.TriggerGauge]
      while (rows.forall(_.max_group_events < 7L) &&
          System.currentTimeMillis() < deadline) {
        rows = gauges.snapshot.filter(_.query_id == qid)
        if (rows.forall(_.max_group_events < 7L)) Thread.sleep(100)
      }
      assert(rows.nonEmpty, "the listener should report this query's triggers")
      assert(rows.exists(_.max_group_events == 7L),
        s"trigger-1 high-water (hottest group folded 7 events) must be " +
          s"reported: ${rows.map(g => (g.batch_id, g.max_group_events))}")
      assert(rows.map(_.late_drops_total).max - lateBefore >= 2L,
        "the cumulative late counter must reach the gauge rows")
      // the same figures surface as a DataFrame (the ops view)
      assert(gauges.toDF(spark).columns.toSeq == Seq("query_id", "run_id",
        "batch_id", "event_ms", "max_group_events", "late_drops_total"))
    } finally spark.streams.removeListener(gauges)
  }

  test("'.*' with '(?t==n)' is rejected loudly (the stated subset)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[TaggedEvent]
    val e = intercept[IllegalArgumentException] {
      SeqMatchStream.seqMatchUpdates(ms.toDS(), "(?1)(?t==60).*(?2)",
        Seq(_.event_type == "signup", _.event_type == "purchase"))
    }
    assert(e.getMessage.contains("batch sequence_match"),
      s"the error must route to the exact batch form: ${e.getMessage}")
  }
}
