package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.server.HttpSql
import graft.streaming.{BrokerSource, FileBroker, Ingest, NatsBridge, NatsBroker}

/** The reference's main program re-expressed
  * (`/root/reference/src/main.rs:19-106`): load the deployment TOML →
  * connect the broker → run the per-subject typed ingest with the
  * delivery budget → serve SQL over HTTP → graceful drain on shutdown.
  *
  * Lifecycle mapping, piece by piece:
  *  - `AppConfig::load_from_file("config/default.toml")` →
  *    [[EngineConfig.loadFromFile]] (same TOML).
  *  - `Nats::new` + `consume()` → `GRAFT_BROKER=nats`: [[NatsBridge]]
  *    connect (ensure stream/consumer) + a daemon relay thread feeding
  *    the spool the streaming source tails. Default `file`: the spool is
  *    fed externally (this environment ships no broker).
  *  - `ClickHouseClient::ping()` fail-fast → SparkSession construction +
  *    a one-row sanity query before any stream starts.
  *  - `Batcher::run` per-subject flush loop →
  *    [[Ingest.startFromBroker]]: one streaming query per subject,
  *    ack-after-write via checkpoint commit, RedeliveryBudget as the
  *    max_deliver analog, DLQ for poison (handler.rs Term ↔ dead-letter,
  *    Nak ↔ checkpoint replay).
  *  - analyst surface (the reference delegates to ClickHouse HTTP
  *    :8123) → [[HttpSql]] on the warehouse port from the TOML.
  *  - `ctrl_c` → `shutdown.cancel()` → `flush_all` → drain: a JVM
  *    shutdown hook stops each streaming query between batches (the
  *    checkpoint makes the cut clean), stops the relay, closes the
  *    broker connection, then the HTTP server.
  */
object ServeMain {

  /** Running engine handle — everything [[boot]] started, stoppable in
    * reference drain order. The query registry is MUTABLE because the
    * compaction pass replaces a table's streaming query (stop → compact
    * → restart from the checkpoint); `queries` always returns the live
    * handles. */
  final class Engine(val spark: SparkSession,
                     @volatile private[graft] var queryMap: Map[String, StreamingQuery],
                     val http: HttpSql, val httpPort: Int,
                     stopRelay: () => Unit) {
    def queries: Map[String, StreamingQuery] = queryMap
    @volatile private var stopMaintenance: () => Unit = () => ()
    @volatile private var maintenanceAlive: () => Boolean = () => false
    @volatile private var maintenanceGraceMs: Long = 15000L
    private[graft] def setMaintenance(stop: () => Unit,
                                      alive: () => Boolean,
                                      graceMs: Long = 15000L): Unit = {
      stopMaintenance = stop; maintenanceAlive = alive
      maintenanceGraceMs = graceMs
    }
    /** `flush_all` + drain (main.rs:95-105): stop the maintenance loop
      * first (it must not restart queries mid-drain), then ingest so no
      * new batch starts, then the relay (which closes its broker
      * connection), then the serving surface. */
    def drain(): Unit = {
      scala.util.Try(stopMaintenance())
      // a compaction pass longer than the maintenance join timeout can
      // still be inside its finally-restart when we get here; its stop
      // check skips the restart in the common case, but a restart that
      // raced the flag must be caught here. The sweep therefore keeps
      // going while the maintenance THREAD is still alive — an
      // all-inactive observation means nothing while a restart can
      // still be registered a moment later — and only exits early once
      // both the thread is dead and nothing is active (bounded). The
      // deadline SCALES with the compaction workload (ADVICE r14: a
      // fixed 15 s loses the race against a partition rewrite longer
      // than the window): setMaintenance sizes it from the compactor's
      // own join grace, so drain outlives any pass the stop handle
      // itself would wait for.
      // soft deadline: the normal bound on query-stop convergence. While
      // the maintenance THREAD is still alive past it (a partition
      // rewrite longer than any schedule-derived guess — the rewrite
      // time is unrelated to the scheduling cadence), keep sweeping: the
      // stop flag is already set, the pass ends within one table, so
      // thread death is finite — the hard cap (10×) only bounds a
      // genuinely hung filesystem.
      val soft = System.currentTimeMillis() + maintenanceGraceMs
      val hard = System.currentTimeMillis() + 10 * maintenanceGraceMs
      var sweep = true
      while (sweep) {
        queries.values.foreach(q => scala.util.Try(q.stop()))
        val alive = maintenanceAlive()
        val settled = !alive && !queries.values.exists(_.isActive)
        val now = System.currentTimeMillis()
        sweep = !settled && (now < soft || (alive && now < hard))
        if (sweep) Thread.sleep(100)
      }
      if (maintenanceAlive())
        System.err.println("[serve] WARNING: maintenance thread still " +
          s"alive after ${10 * maintenanceGraceMs} ms drain hard cap — " +
          "a compaction rewrite outlived it (hung FS?); a restarted " +
          "writer may survive this drain")
      // final sweep: a restart registered in the race window right
      // before the thread died is stopped here
      queries.values.foreach(q => scala.util.Try(q.stop()))
      stopRelay()
      scala.util.Try(http.stop())
    }
  }

  /** Wire the full engine from config. Separated from `main` so specs
    * can drive the exact production wiring against temp dirs. */
  def boot(cfg: EngineConfig, spark: SparkSession, wireRoot: String,
           outDir: String, ckptRoot: String, httpPort: Int,
           useNats: Boolean): Engine = {
    // ping() analog: fail fast before any stream starts
    require(spark.range(1).count() == 1L, "SparkSession sanity check failed")
    // the tailing file source needs every subject's spool dir to exist
    // before its stream starts (the relay/producer may not have written
    // yet when the engine comes up)
    cfg.broker.subjects.foreach(s =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wireRoot, s)))
    // heal interrupted compaction swaps BEFORE any writer starts — the
    // bak/tmp recovery has one branch that is only safe with the writer
    // quiet (see Compaction.healInterrupted). UNCONDITIONAL: the damage
    // a crashed swap leaves (a partition dir moved aside to a hidden
    // .bak) persists on disk regardless of whether compaction is still
    // enabled, and rebooting with it disabled must not serve a table
    // with a partition silently missing.
    cfg.broker.subjects.foreach { s =>
      val table = graft.streaming.EventSchemas.routes(s)
      sources.Compaction.healInterrupted(spark, s"$outDir/$table")
        .foreach(p => println(s"[serve] healed interrupted compaction of " +
          s"$table/$p"))
    }

    val (broker, stopRelay) =
      if (useNats) {
        // fail fast on a bad config (ping() analog for the broker), then
        // hand the connection to the supervised relay, which owns
        // reconnection from here on
        NatsBridge.connect(cfg).close()
        @volatile var stop = false
        val relay = new Thread(() => NatsBridge.superviseRelay(cfg, wireRoot,
          batch = cfg.batcher.maxRows.min(512L).toInt,
          expiresMs = cfg.batcher.flushIntervalMs, stop = () => stop),
          "graft-nats-relay")
        relay.setDaemon(true)
        relay.start()
        (NatsBroker(wireRoot): BrokerSource, () => { stop = true; relay.join(5000) })
      } else (FileBroker(wireRoot): BrokerSource, () => ())

    // the TOML batcher envelope applies at the relay: superviseRelay
    // runs each connection through NatsBridge.SpoolBatcher, which cuts
    // spool files on max_rows/max_bytes and drains on flush_interval_ms
    // (the reference's Batcher, src/handler.rs:96-160 — SURVEY §2.9
    // O-T2). Downstream, the streaming queries trigger on the same
    // flush_interval_ms so the ingest cadence matches the flush cadence.
    val queries = Ingest.startFromBroker(spark, broker, outDir, ckptRoot,
      trigger = Ingest.batcherParams(cfg)._1,
      subjects = cfg.broker.subjects)
    // no leak on a failed boot: if the HTTP server cannot start (port
    // bound), the just-started streaming queries and the relay must not
    // keep running with no handle to stop them
    try {
      val http = new HttpSql(spark, httpPort, dataDir = Some(outDir))
      val port = http.start()
      val engine = new Engine(spark, queries, http, port, stopRelay)
      if (cfg.compaction.enabled) {
        val (stop, alive) = startCompactor(engine, broker, outDir,
          ckptRoot, Ingest.batcherParams(cfg)._1, cfg)
        // drain grace sized to the maintenance workload: at least one
        // full scheduler interval (a pass started just before drain) on
        // top of a rewrite-time floor, never below the old fixed 15 s
        engine.setMaintenance(stop, alive,
          graceMs = math.max(15000L, cfg.compaction.intervalMs + 30000L))
      }
      engine
    } catch {
      case e: Throwable =>
        queries.values.foreach(q =>
          try q.stop() catch { case scala.util.control.NonFatal(_) => () })
        try stopRelay() catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
  }

  /** One maintenance pass over the served tables (the MergeTree
    * background-merge analog — `migrations .sql:18-20`, SURVEY §4.2 "ours
    * to schedule"): for each table whose file census exceeds
    * `max_files` in any date partition, PAUSE the writer (stop its
    * streaming query — the pause-the-writer discipline
    * [[graft.sources.Compaction]] requires), pool the committed
    * micro-batches of each exploded partition into ~target-byte files
    * ([[graft.sources.Compaction.compactIngest]] — batch ids past the
    * checkpoint's last commit stay untouched, so replay stays safe),
    * then RESTART the query from its checkpoint and swap the new handle
    * into the engine. Returns (table, per-partition stats) for
    * observability; errors compact nothing and leave the restart in
    * place. */
  private[graft] def compactionPass(engine: Engine, broker: BrokerSource,
      outDir: String, ckptRoot: String,
      trigger: org.apache.spark.sql.streaming.Trigger,
      cfg: EngineConfig,
      stopped: () => Boolean = () => false): Seq[(String, sources.Compaction.Stats)] = {
    import graft.streaming.EventSchemas
    engine.queryMap.toSeq.flatMap { case (table, q) =>
      val tdir = s"$outDir/$table"
      // a drain that begins mid-pass must end the pass within one
      // table, not stop/rewrite the remaining ones against the clock
      val needy =
        if (stopped()) Seq.empty
        else sources.Parts.needingCompaction(engine.spark, tdir,
          cfg.compaction.maxFiles, cfg.compaction.targetBytes)
      if (needy.isEmpty) Seq.empty
      else {
        val subject = EventSchemas.routes.collectFirst {
          case (s, t) if t == table => s
        }.getOrElse(
          throw new IllegalStateException(s"no subject routes to $table"))
        // pause-the-writer at a BATCH BOUNDARY when possible: stopping
        // mid-batch makes the restart replay that batch, and each replay
        // spends RedeliveryBudget — enough maintenance interruptions of
        // one batch would dead-letter healthy rows. Bounded wait for the
        // trigger to go idle (a continuously-fed stream may never
        // quiesce, so this cannot be processAllAvailable); the residual
        // mid-batch stop is rare, bounded by max_deliver, and the
        // fragmentation hysteresis above removes the repeated-
        // interruption loop.
        val boundary = System.currentTimeMillis() + 5000
        while (q.isActive && q.status.isTriggerActive &&
               System.currentTimeMillis() < boundary)
          Thread.sleep(50)
        // A failed stop that leaves the query RUNNING must abort the
        // pass (two writers around a swap is the one unrecoverable
        // shape); a query that is already dead proceeds — compaction +
        // restart is the healing.
        try q.stop() catch { case scala.util.control.NonFatal(_) => () }
        if (q.isActive)
          throw new IllegalStateException(
            s"query for $table did not stop; skipping compaction")
        try {
          val maxCommitted = sources.Compaction.committedBatchMax(
            engine.spark, s"$ckptRoot/$table")
          needy.map { p =>
            table -> sources.Compaction.compactIngest(engine.spark, p,
              maxCommitted, targetBytes = cfg.compaction.targetBytes)
          }
        } finally {
          // a failed swap must be healed BEFORE the writer returns —
          // the writer would otherwise recreate the partition next to
          // the backup and a later pass could mistake the backup for
          // stale (Compaction.healInterrupted's ambiguous branch)
          try sources.Compaction.healInterrupted(engine.spark, tdir)
          catch { case scala.util.control.NonFatal(_) => () }
          // resume from the checkpoint: a fresh query continues exactly
          // where the stopped one committed — UNLESS drain asked the
          // maintenance loop to stop while this pass was in flight: a
          // restart after drain would leave a live writer nobody stops
          // (drain's re-sweep catches the narrow race where this check
          // passes just before the flag flips)
          if (!stopped()) {
            val nq = streaming.Ingest.startFromBroker(engine.spark, broker,
              outDir, ckptRoot, trigger, Seq(subject))(table)
            engine.queryMap = engine.queryMap.updated(table, nq)
          }
        }
      }
    }
  }

  /** Daemon scheduler for [[compactionPass]] — fires every
    * `compaction.interval_ms`; a pass failure is logged and the loop
    * continues (maintenance must never take the engine down). Returns
    * (stop handle, thread-alive probe) — drain keeps sweeping queries
    * while the probe says the loop may still register a restart. */
  private def startCompactor(engine: Engine, broker: BrokerSource,
      outDir: String, ckptRoot: String,
      trigger: org.apache.spark.sql.streaming.Trigger,
      cfg: EngineConfig): (() => Unit, () => Boolean) = {
    @volatile var stop = false
    val t = new Thread(() => {
      while (!stop) {
        try {
          val done = compactionPass(engine, broker, outDir, ckptRoot,
            trigger, cfg, stopped = () => stop)
          done.foreach { case (table, st) =>
            println(s"[serve] compacted $table: ${st.filesBefore} -> " +
              s"${st.filesAfter} files (${st.rows} rows)")
          }
          // the SQ8 re-scale actuator rides the same maintenance cadence
          // (opt-in via -Dgraft.vec.sq8CompactDir; no-op otherwise) —
          // clip probe each pass, linear re-encode only when it bites
          pipeline.VecBackbone.sq8MaintenancePass(engine.spark)
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[serve] compaction pass failed: ${e.getMessage}")
        }
        val deadline = System.currentTimeMillis() + cfg.compaction.intervalMs
        while (!stop && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
      }
    }, "graft-compactor")
    t.setDaemon(true)
    t.start()
    // the stop handle's join matches drain's scaled grace (ADVICE r14:
    // a 10 s join under a longer rewrite returned with the thread alive)
    val joinMs = math.max(15000L, cfg.compaction.intervalMs + 30000L)
    (() => { stop = true; t.join(joinMs) }, () => t.isAlive)
  }

  def main(args: Array[String]): Unit = {
    val cfg = args.headOption.map(EngineConfig.loadFromFile)
      .getOrElse(EngineConfig.default)
    def envOr(k: String, d: String) = sys.env.getOrElse(k, d)
    val root = envOr("GRAFT_DATA_ROOT",
      s"${sys.props("java.io.tmpdir")}/graft_serve")
    val spark = EngineSession.local(appName = "graft-serve")
    val engine = boot(cfg, spark,
      wireRoot = envOr("GRAFT_WIRE_ROOT", s"$root/wire"),
      outDir = envOr("GRAFT_OUT_DIR", s"$root/tables"),
      ckptRoot = envOr("GRAFT_CKPT", s"$root/ckpt"),
      httpPort = envOr("GRAFT_HTTP_PORT", cfg.warehouse.port.toString).toInt,
      useNats = envOr("GRAFT_BROKER", "file") == "nats")
    println(s"[serve] graft engine up: http=${engine.httpPort} " +
      s"subjects=${cfg.broker.subjects.mkString(",")} " +
      s"broker=${envOr("GRAFT_BROKER", "file")}")
    sys.addShutdownHook {
      println("[serve] draining...")
      engine.drain()
      spark.stop()
    }
    engine.queries.values.foreach(_.awaitTermination())
  }
}
