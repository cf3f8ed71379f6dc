package graft.sources

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `system.parts` analog ([[Parts]]). */
class PartsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("per-partition file/byte census and the compaction work queue") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_parts").toString
    // Jan 1 written fragmented (4 files), Jan 2 compact (1 file)
    Seq.tabulate(8)(i => (i.toLong, "2024-01-01"))
      .toDF("v", "event_date").repartition(4)
      .write.partitionBy("event_date").mode("append").parquet(dir)
    Seq((99L, "2024-01-02")).toDF("v", "event_date").coalesce(1)
      .write.partitionBy("event_date").mode("append").parquet(dir)

    val parts = Parts.forTable(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(parts.map(_._1).toSeq ==
      Seq("event_date=2024-01-01", "event_date=2024-01-02"))
    val Array(jan1, jan2) = parts
    assert(jan1._2 == 4 && jan2._2 == 1)
    assert(jan1._3 > 0 && jan2._3 > 0)
    // census survives the partition census -> compaction round trip
    assert(Parts.needingCompaction(spark, dir, maxFiles = 2) ==
      Seq("event_date=2024-01-01"))
    Compaction.compact(spark, dir, sortCols = Seq("v"))
    assert(Parts.needingCompaction(spark, dir, maxFiles = 2).isEmpty)
    // rows intact after compaction, census reflects the merge
    assert(spark.read.parquet(dir).count() == 9)
    val after = Parts.forTable(spark, dir)
      .filter(col("partition") === "event_date=2024-01-01").head()
    assert(after.getLong(1) == 1)
  }

  test("empty / missing / unpartitioned tables") {
    import spark.implicits._
    assert(Parts.forTable(spark, "/nonexistent/graft_parts").count() == 0)
    val flat = java.nio.file.Files.createTempDirectory("graft_parts_flat").toString
    Seq(1L, 2L).toDF("v").coalesce(1).write.mode("overwrite").parquet(flat)
    val row = Parts.forTable(spark, flat).head()
    assert(row.getString(0) == "<unpartitioned>" && row.getLong(1) == 1)
  }
}
