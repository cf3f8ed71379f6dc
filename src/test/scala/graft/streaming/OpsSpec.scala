package graft.streaming

import java.nio.file.Files
import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("FlushLog records per-batch rows; drain stops with nothing in flight (O-T7)") {
    import spark.implicits._
    val in = Files.createTempDirectory("ops_in").toString
    val out = Files.createTempDirectory("ops_out").toString
    val ckpt = Files.createTempDirectory("ops_ck").toString
    val log = Ops.withFlushLog(spark)
    try {
      Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
        .write.mode("append").json(in)
      val q = spark.readStream
        .schema("k STRING, v INT").json(in)
        .writeStream.queryName("ops-test")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .start()
      q.processAllAvailable()
      Seq(("d", 4)).toDF("k", "v").write.mode("append").json(in)
      Ops.drain(q)

      assert(!q.isActive)
      assert(spark.read.parquet(out).count() == 4) // drain flushed the tail
      // listener events are delivered asynchronously post-termination
      spark.streams.awaitAnyTermination(1000)
      val mine = log.flushes.filter(f => f.queryName == "ops-test" && f.rows > 0)
      assert(mine.map(_.rows).sum == 4, s"got: ${log.flushes}")
      assert(mine.forall(_.durationMs >= 0))
    } finally spark.streams.removeListener(log)
  }
}
