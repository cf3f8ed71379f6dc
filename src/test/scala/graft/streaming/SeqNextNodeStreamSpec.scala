package graft.streaming

import java.sql.Timestamp

import graft.TestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twin of the `sequence_next_node` aggregate
  * ([[SeqNextNodeStream]]): the law is PREFIX exactness — after every
  * micro-batch, the latest streamed answer per user equals the batch
  * aggregate over exactly the consumed prefix, for every streamable
  * direction×base combo, ties straddling cuts included. The unstreamable
  * backward scans are rejected loudly. */
class SeqNextNodeStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val t0 = 1726300800000L
  private def ts(min: Long) = new Timestamp(t0 + min * 60000)
  private val types = Seq("signup", "click", "purchase", "view")

  private val conds = Seq[TaggedEvent => Boolean](
    _.event_type == "signup", _.event_type == "click")
  // the base condition gates anchors on even ties (deterministic, hits
  // roughly half the candidate anchors per draw)
  private val baseFn = (e: TaggedEvent) => e.tie % 2 == 0

  private def batchAnswer(log: Seq[TaggedEvent], dir: String, base: String,
                          withBase: Boolean): Map[Long, String] = {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    val fn = if (withBase) "sequence_next_node_base" else "sequence_next_node"
    val baseArg = if (withBase) "tie % 2 = 0, " else ""
    log.toDF("user_id", "event_type", "ts", "tie")
      .groupBy("user_id")
      .agg(expr(s"$fn('$dir', '$base', ts, tie, event_type, $baseArg" +
        "event_type = 'signup', event_type = 'click')").as("nn"))
      .collect()
      .collect { case r if !r.isNullAt(1) => r.getLong(0) -> r.getString(1) }
      .toMap
  }

  test("prefix exactness: latest streamed == batch aggregate after every cut") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val combos = Seq(
      ("forward", "first_match", false), ("forward", "first_match", true),
      ("forward", "head", false), ("forward", "last_match", false),
      ("backward", "tail", false))
    combos.foreach { case (dir, base, withBase) =>
      (0 until 2).foreach { draw =>
        val rnd = new scala.util.Random(1900 + draw + base.hashCode % 89)
        val log = (0 until 240).map { i =>
          TaggedEvent(rnd.nextInt(10).toLong, types(rnd.nextInt(types.size)),
            ts(rnd.nextInt(96) * 30L), i.toLong)
        }.sortBy(e => (e.ts.getTime, e.tie))
        val ms = MemoryStream[TaggedEvent]
        val name = s"snn_${dir}_${base}_${withBase}_$draw"
        val q = SeqNextNodeStream.seqNextNodeUpdates(ms.toDS(), dir, base,
            conds, _.event_type, if (withBase) Some(baseFn) else None)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        var consumed = Seq.empty[TaggedEvent]
        var nonEmptyPrefixes = 0
        var rest = log
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(50)
          ms.addData(rest.take(n): _*); q.processAllAvailable()
          consumed = consumed ++ rest.take(n); rest = rest.drop(n)
          // THE LAW: latest streamed answer == batch over the prefix
          val streamed = spark.table(name)
            .withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("user_id").orderBy(col("seq").desc)))
            .filter(col("rn") === 1)
            .collect().map(r => r.getLong(0) ->
              (r.getBoolean(1), Option(r.getString(2)))).toMap
          val want = batchAnswer(consumed, dir, base, withBase)
          if (want.nonEmpty) nonEmptyPrefixes += 1
          want.foreach { case (u, ans) =>
            val got = streamed.get(u)
            assert(got.exists(g => g._1 && g._2.contains(ans)),
              s"$dir/$base base=$withBase draw $draw after " +
                s"${consumed.size}: user $u want $ans got $got")
          }
          streamed.foreach { case (u, (hasChain, nn)) =>
            if (hasChain)
              assert(want.get(u).contains(nn.orNull),
                s"$dir/$base base=$withBase draw $draw after " +
                  s"${consumed.size}: user $u streamed $nn, batch " +
                  s"${want.get(u)}")
          }
        }
        q.stop()
        // backward/tail's answer needs the chain at the CURRENT stream
        // edge, so the final prefix is often empty — the discrimination
        // requirement is that SOME prefixes carried answers
        assert(nonEmptyPrefixes > 0,
          s"$dir/$base draw $draw: no prefix ever produced an answer")
      }
    }
  }

  test("the unstreamable and degenerate combos are rejected loudly") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[TaggedEvent]
    Seq("first_match", "last_match").foreach { b =>
      val e = intercept[IllegalArgumentException] {
        SeqNextNodeStream.seqNextNodeUpdates(ms.toDS(), "backward", b,
          conds, _.event_type)
      }
      assert(e.getMessage.contains("batch sequence_next_node"),
        s"backward/$b must route to the batch form: ${e.getMessage}")
    }
    Seq(("forward", "tail"), ("backward", "head")).foreach { case (d, b) =>
      val e = intercept[IllegalArgumentException] {
        SeqNextNodeStream.seqNextNodeUpdates(ms.toDS(), d, b,
          conds, _.event_type)
      }
      assert(e.getMessage.contains("anchor sits at the END"))
    }
  }

  test("survives a checkpoint restart mid-stream (forward/last_match)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1931)
    val log = (0 until 200).map { i =>
      TaggedEvent(rnd.nextInt(8).toLong, types(rnd.nextInt(types.size)),
        ts(rnd.nextInt(96) * 30L), i.toLong)
    }.sortBy(e => (e.ts.getTime, e.tie))
    val (a, b) = log.splitAt(120)
    val inDir = java.nio.file.Files.createTempDirectory("snn_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("snn_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("snn_ck").toString
    def start() = {
      val src = spark.readStream
        .schema(Seq.empty[TaggedEvent].toDS().schema)
        .parquet(inDir).as[TaggedEvent]
      SeqNextNodeStream.seqNextNodeUpdates(src, "forward", "last_match",
          conds, _.event_type)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }
    a.toDS().repartition(2).write.mode("append").parquet(inDir)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    b.toDS().repartition(2).write.mode("append").parquet(inDir)
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val streamed = spark.read.parquet(outDir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("seq").desc)))
      .filter(col("rn") === 1 && col("has_chain"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val want = batchAnswer(log, "forward", "last_match", withBase = false)
    assert(streamed == want, s"restart diverged: $streamed != $want")
    assert(want.nonEmpty)
  }
}
