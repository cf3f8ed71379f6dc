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

  test("compaction preserves EVERY on-disk partition level (ingest layout)") {
    import spark.implicits._
    // the ingest sink writes event_date=X/ingest_batch=N — compacting
    // with only the date level would flatten ingest_batch into a data
    // column and leave a mixed-depth layout the next replayed batch
    // cannot coexist with
    val dir = Files.createTempDirectory("compact2").toString + "/login_events"
    (0 until 3).foreach { b =>
      (0 until 40).map { i =>
        val ts = new java.sql.Timestamp(1726300800000L + (b * 40 + i) * 1000L)
        (s"e-$b-$i", "login", ts, java.sql.Date.valueOf("2024-09-14"), b.toLong)
      }.toDF("event_id", "event_name", "timestamp", "event_date", "ingest_batch")
        .coalesce(2).write.mode("append")
        .partitionBy("event_date", "ingest_batch").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect().map(_.getString(0)).sorted
    Compaction.compact(spark, dir, targetBytes = 512L * 1024 * 1024)
    // both levels still exist as DIRECTORIES
    val dateDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
    assert(dateDirs.nonEmpty, "event_date level lost")
    val batchDirs = dateDirs.flatMap(_.listFiles())
      .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
    assert(batchDirs.length == 3,
      s"ingest_batch level flattened: ${batchDirs.mkString(",")}")
    val after = spark.read.parquet(dir)
    assert(after.collect().map(_.getString(0)).sorted.sameElements(before))
    // and a replayed-batch dynamic overwrite still lands cleanly
    Seq(("e-1-replay", "login",
        new java.sql.Timestamp(1726300845000L),
        java.sql.Date.valueOf("2024-09-14"), 1L))
      .toDF("event_id", "event_name", "timestamp", "event_date", "ingest_batch")
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date", "ingest_batch").parquet(dir)
    val replayed = spark.read.parquet(dir)
    assert(replayed.filter(col("ingest_batch") === 1).count() == 1,
      "replayed batch did not replace its partition")
    assert(replayed.count() == 81, s"expected 40+1+40 rows")
  }

  test("compaction recovers from a crash between the swap renames") {
    import spark.implicits._
    val parent = Files.createTempDirectory("compact3")
    val dir = parent.toString + "/t"
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(4).write.parquet(dir)
    val rows = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted
    // simulate the crash window: table moved aside to .bak, tmp lost
    val bak = new java.io.File(parent.toString, ".t_compact_bak")
    assert(new java.io.File(dir).renameTo(bak))
    assert(!new java.io.File(dir).exists())
    // a re-run must restore from .bak and complete normally
    val stats = Compaction.compact(spark, dir, sortCols = Seq("id"),
      targetBytes = 512L * 1024 * 1024)
    assert(stats.rows == 100)
    assert(spark.read.parquet(dir).collect().map(_.getLong(0)).sorted
      .sameElements(rows))
    assert(!bak.exists(), "backup not cleaned up after recovery")
  }
}
