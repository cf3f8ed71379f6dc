package graft.sources

import java.nio.file.Files
import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("compaction merges micro-batch files, preserves content and sort") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact").toString + "/events_table"
    // simulate 12 micro-batch appends → many small files
    (0 until 12).foreach { b =>
      (0 until 50).map { i =>
        val ts = new java.sql.Timestamp(1726300800000L + (b * 50 + i) * 1000L)
        (s"e-$b-$i", "login", ts, java.sql.Date.valueOf("2024-09-14"))
      }.toDF("event_id", "event_name", "timestamp", "event_date")
        .coalesce(2).write.mode("append").partitionBy("event_date").parquet(dir)
    }
    val beforeRows = spark.read.parquet(dir).collect().map(_.getString(0)).sorted

    val stats = Compaction.compact(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(stats.filesBefore > stats.filesAfter, s"no merge happened: $stats")
    assert(stats.filesAfter <= 2)
    assert(stats.rows == 600)

    val after = spark.read.parquet(dir)
    assert(after.collect().map(_.getString(0)).sorted.sameElements(beforeRows))
    // partition layout preserved
    assert(after.columns.contains("event_date"))
    // rows within each output file are timestamp-sorted (row-group skipping)
    val perFile = after.withColumn("f", input_file_name())
      .withColumn("ts_long", unix_micros(col("timestamp")))
    val unsorted = perFile.withColumn("prev",
        lag("ts_long", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("f").orderBy(monotonically_increasing_id())))
      .filter(col("prev").isNotNull && col("prev") > col("ts_long"))
    assert(unsorted.count() == 0, "rows not sorted within compacted files")
  }
}
