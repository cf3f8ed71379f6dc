package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("events loader normalizes both historical ts schemas to TimestampType") {
    import spark.implicits._
    // the driver's testdata has shipped ts as int64 TIMESTAMP(NANOS) and
    // as TIMESTAMP(MICROS) across data drops; the loader must sniff and
    // normalize both so downstream queries see one type
    val micros = 1726300800123456L // 2024-09-14T08:00:00.123456Z

    val microsDir = java.nio.file.Files.createTempDirectory("ev_micros").toString
    val tsMicros = new Timestamp(micros / 1000)
    tsMicros.setNanos(((micros % 1000000L) * 1000L).toInt)
    Seq((1L, tsMicros, 7L, "login", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$microsDir/events.parquet")

    val nanosDir = java.nio.file.Files.createTempDirectory("ev_nanos").toString
    Seq((1L, micros * 1000L, 7L, "login", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    Seq(microsDir, nanosDir).foreach { d =>
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType == TimestampType, s"dir $d")
      val got = df.select(unix_micros(col("ts"))).head().getLong(0)
      assert(got == micros, s"dir $d: $got != $micros")
    }
  }

  test("int64 ts outside the nanos epoch range fails loudly, not silently /1000") {
    import spark.implicits._
    // a future drop shipping RAW MICROS as unannotated int64 must not be
    // silently divided by 1000 (ADVICE r10): the loader's per-row unit
    // guard raises instead
    val microsMagnitude = 1726300800123456L // plausible as micros, not nanos
    val d = java.nio.file.Files.createTempDirectory("ev_badunit").toString
    Seq((1L, microsMagnitude, 7L, "login", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val ex = intercept[Exception] {
      Tables.events(spark, d).select("ts").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("nanosecond epoch range")),
      s"expected the unit-guard error, got: $ex")
  }

  test("null int64 ts rows pass through as null, not a unit-guard crash") {
    import spark.implicits._
    // the guard must only fire on NON-NULL out-of-range values: a
    // nullable ts column with null rows loaded fine before the guard
    // existed and must keep doing so
    val micros = 1726300800123456L
    val d = java.nio.file.Files.createTempDirectory("ev_nullts").toString
    Seq((1L, Some(micros * 1000L), 7L, "login", 1.0, "{}"),
        (2L, None: Option[Long], 8L, "login", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = Tables.events(spark, d)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(rows == Map(1L -> Some(micros), 2L -> None))
  }

  test("NULL-ts rows: argmax skips them, sort emits them last (DuckDB parity)") {
    import spark.implicits._
    // NULL ts is now a legal input (passthrough above); the two queries
    // whose semantics it can flip must behave like the DuckDB oracle:
    // o_a5 must never pick a NULL-ts event as first/last (Spark struct
    // ordering ranks a NULL field LOWEST, DuckDB ranks it HIGHEST — both
    // are wrong answers; the fix excludes NULL-ts rows from the struct),
    // and o_s1's ORDER BY ts must put NULL rows last like DuckDB does.
    val base = 1726300800000000L // micros
    val d = java.nio.file.Files.createTempDirectory("ev_nullsem").toString
    Seq((1L, None: Option[Long], 7L, "a", 1.0, "{}"),
        (2L, Some(base * 1000L), 7L, "b", 1.0, "{}"),
        (3L, Some((base + 5000000L) * 1000L), 7L, "c", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")

    val am = operators.Relational.queries("o_a5_argmax")(spark, d).head()
    assert(am.getLong(1) == 3L, s"last_event_id must skip NULL ts: $am")
    assert(am.getLong(2) == 2L, s"first_event_id must skip NULL ts: $am")

    val ids = operators.Relational.queries("o_s1_sort")(spark, d)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(2L, 3L, 1L), s"NULL-ts row must sort last: $ids")
  }

  test("current testdata loads through the events loader at every sf") {
    Seq("sf0.001", "sf0.01").foreach { sf =>
      val df = Tables.events(spark, s"/root/testdata/$sf")
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.limit(1).count() == 1)
    }
  }

  test("loader memo: repeated loads share the analyzed handle, a data " +
      "drop at the same path gets fresh data") {
    import spark.implicits._
    // r18 opt pin: Tables memoizes the analyzed read handle per
    // (session, dir, table, file-metadata version). Two properties:
    // same-version loads return the SAME plan instance (no footer
    // re-derivation), and an in-place overwrite — the spec-corpus
    // pattern — is SERVED FRESH because the version triple changes.
    val d = java.nio.file.Files.createTempDirectory("tbl_memo").toString
    Seq((1L, "alpha", "en")).toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val first = Tables.documents(spark, d)
    val again = Tables.documents(spark, d)
    assert(again.queryExecution.logical eq first.queryExecution.logical,
      "same-version load must reuse the memoized handle")
    assert(first.select("text").head().getString(0) == "alpha")

    // in-place data drop: new content, same path — must not serve stale
    Thread.sleep(5) // ensure a distinguishable mtime even on coarse clocks
    Seq((2L, "beta", "en"), (3L, "gamma", "en")).toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val fresh = Tables.documents(spark, d)
    assert(fresh.count() == 2,
      "overwritten corpus must be re-opened, not served from the memo")
    assert(fresh.select("text").orderBy("doc_id").collect().map(_.getString(0))
      .toSeq == Seq("beta", "gamma"))
  }
}
