package graft

import org.apache.spark.sql.SparkSession

/** Canonical engine session (SURVEY §7-M0): UTC, AQE, right-sized
  * shuffle parallelism, graft extensions (native functions + the
  * CollapseDedup rule) installed at build time. */
object EngineSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // ENGINE-WIDE default, set at build time rather than sneaked in by
      // the first Tables.events call: TIMESTAMP(NANOS) parquet columns
      // surface as raw int64 (the events loader normalizes them with a
      // unit guard). Restoring the conf per-read is NOT safe — the scan
      // re-reads it at execution, after the schema was already inferred.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
