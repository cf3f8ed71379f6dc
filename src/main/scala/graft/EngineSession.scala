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
      // Always use the consolidated sort-based shuffle writers (r18 opt,
      // guide §2.2 "fewer, larger" / §6 small-files): below this
      // threshold Spark picks the BYPASS-merge writer, which opens one
      // file + one compression stream PER REDUCE PARTITION per map task
      // — profiled as the dominant fixed cost of every small exchange
      // (a 32-task stage writing a 32-partition shuffle paid ~1000 file
      // opens: 5.6 s of task time for a 236 KB shuffle; 1.0 s with the
      // consolidated writer). SQL exchanges then ride UnsafeShuffleWriter
      // (one spill file + index per map task) at EVERY partition count —
      // the same writer production uses above the default 200 threshold,
      // so this is not a local-mode tune; it removes the small-shuffle
      // special case.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.props.getOrElse("graft.shuffle.bypassThreshold", "1"))
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
