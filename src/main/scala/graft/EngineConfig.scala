package graft

import java.time.Duration

/** Typed engine configuration — the analog of the reference's TOML config
  * (src/config.rs:5-17 `AppConfig { tracing, nats, clickhouse, batcher }`,
  * defaults in config/default.toml). Parsed from the same TOML shape into
  * case classes, with every default matching default.toml value-for-value,
  * so a reference deployment's config file drops in unchanged.
  *
  * The parser covers exactly the TOML subset the reference's config uses:
  * `[section]` / `[section.sub]` headers, `key = value` with string, int,
  * bool, and string-array values, and `#` comments. Unknown keys are
  * ignored (forward compatibility); type mismatches fail loudly.
  */
final case class TracingConfig(
    level: String = "info",
    format: String = "text",
    withLevel: Boolean = true,
    withTarget: Boolean = false,
    withThreadIds: Boolean = false,
    withLineNumber: Boolean = false,
    withFile: Boolean = false)

/** NATS stream envelope (src/config.rs:58-70). `maxAge` drives the
  * retention job ([[graft.sources.Retention]]) — the reference delegates
  * age expiry to JetStream (`max_age = "24h"`, default.toml:27); here the
  * storage tier owns it. */
final case class StreamEnvelopeConfig(
    name: String = "ClickHouseConsumer",
    retention: String = "workqueue",
    discard: String = "old",
    storage: String = "memory",
    noAck: Boolean = false,
    maxConsumers: Int = 100,
    maxAge: String = "24h",
    needCreate: Boolean = true) {
  def maxAgeDuration: Duration = EngineConfig.parseDuration(maxAge)
}

/** Broker connectivity (src/config.rs:39-56 NatsConfig). */
final case class BrokerConfig(
    clientPort: Int = 4222,
    serverPort: Int = 8222,
    username: String = "user",
    password: String = "password",
    host: String = "localhost",
    queue: String = "clickhouse-queue",
    subjects: Seq[String] = Seq("events.login"),
    consumerName: String = "click-consumer",
    streamConfig: StreamEnvelopeConfig = StreamEnvelopeConfig()) {
  /** nats://host:port (src/config.rs:52-54 get_addr). */
  def addr: String = s"nats://$host:$clientPort"
}

/** Warehouse connectivity (src/config.rs:100-110 ClickHouseConfig) — kept
  * for config-file compatibility; the Spark engine's "warehouse" is the
  * parquet table root, but database names etc. still flow from here. */
final case class WarehouseConfig(
    host: String = "localhost",
    port: Int = 8123,
    user: String = "",
    password: String = "",
    database: String = "database",
    maxOpenConns: Int = 1,
    maxIdleConns: Int = 1,
    debug: Boolean = false)

/** Micro-batcher flush envelope (src/config.rs:113-118 BatchConfig,
  * defaults default.toml:40-43) — feeds [[graft.streaming.Ingest]]'s
  * source-rate options and trigger. */
final case class BatcherConfig(
    maxRows: Long = 100000L,
    maxBytes: Long = 60000000L,
    flushIntervalMs: Long = 1000L) {
  def flushInterval: Duration = Duration.ofMillis(flushIntervalMs)
}

/** Background small-file compaction scheduling — the analog of
  * MergeTree's continuous part merges (the reference's storage engine
  * merges inserted parts in the background, `migrations .sql:18-20`;
  * SURVEY §4.2 "ours to schedule"). Off by default: a batch-only
  * deployment has no writer to pause. When enabled, [[ServeMain]] runs
  * a maintenance pass every `intervalMs` that compacts any served
  * table partition whose file count exceeds `maxFiles` into
  * ~`targetBytes` files. */
final case class CompactionConfig(
    enabled: Boolean = false,
    intervalMs: Long = 60000L,
    maxFiles: Int = 16,
    targetBytes: Long = 128L * 1024 * 1024)

final case class EngineConfig(
    tracing: TracingConfig = TracingConfig(),
    broker: BrokerConfig = BrokerConfig(),
    warehouse: WarehouseConfig = WarehouseConfig(),
    batcher: BatcherConfig = BatcherConfig(),
    compaction: CompactionConfig = CompactionConfig())

object EngineConfig {

  /** Built-in defaults == config/default.toml verbatim. */
  val default: EngineConfig = EngineConfig()

  def loadFromFile(path: String): EngineConfig =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** "24h" / "30m" / "120s" / "1500ms" → Duration (JetStream max_age
    * grammar as the reference uses it). */
  def parseDuration(s: String): Duration = {
    val m = """(\d+)\s*(ms|s|m|h|d)""".r
    s.trim match {
      case m(n, "ms") => Duration.ofMillis(n.toLong)
      case m(n, "s") => Duration.ofSeconds(n.toLong)
      case m(n, "m") => Duration.ofMinutes(n.toLong)
      case m(n, "h") => Duration.ofHours(n.toLong)
      case m(n, "d") => Duration.ofDays(n.toLong)
      case other => throw new IllegalArgumentException(s"bad duration: '$other'")
    }
  }

  private sealed trait TomlValue
  private case class TStr(v: String) extends TomlValue
  private case class TInt(v: Long) extends TomlValue
  private case class TBool(v: Boolean) extends TomlValue
  private case class TArr(v: Seq[String]) extends TomlValue

  /** Parse the reference's TOML subset into section → key → value. */
  private def parseToml(text: String): Map[String, Map[String, TomlValue]] = {
    var section = ""
    val out = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[String, TomlValue]]
    val header = """\[([A-Za-z0-9_.]+)\]""".r
    val kv = """([A-Za-z0-9_]+)\s*=\s*(.+)""".r
    def stripComment(s: String): String = {
      // a '#' outside quotes starts a comment; inside quotes, a backslash
      // escapes the next char (so \" does not toggle the string state)
      var inStr = false
      var esc = false
      val b = new StringBuilder
      for (c <- s) {
        if (esc) { esc = false; b += c }
        else if (inStr && c == '\\') { esc = true; b += c }
        else {
          if (c == '"') inStr = !inStr
          if (c == '#' && !inStr) return b.toString
          b += c
        }
      }
      b.toString
    }
    def unescape(v: String): String = {
      val b = new StringBuilder
      var i = 0
      while (i < v.length) {
        if (v(i) == '\\' && i + 1 < v.length) {
          v(i + 1) match {
            case '"' => b += '"'
            case '\\' => b += '\\'
            case 'n' => b += '\n'
            case 't' => b += '\t'
            case 'r' => b += '\r'
            case o => b += '\\'; b += o
          }
          i += 2
        } else { b += v(i); i += 1 }
      }
      b.toString
    }
    def value(raw: String, line: String): TomlValue = raw.trim match {
      case v if v.startsWith("\"") && v.endsWith("\"") && v.length >= 2 =>
        TStr(unescape(v.substring(1, v.length - 1)))
      case "true" => TBool(true)
      case "false" => TBool(false)
      case v if v.startsWith("[") && v.endsWith("]") =>
        val body = v.substring(1, v.length - 1).trim
        TArr(if (body.isEmpty) Seq.empty
        else body.split(",").toSeq.map(_.trim).map {
          case e if e.startsWith("\"") && e.endsWith("\"") =>
            unescape(e.substring(1, e.length - 1))
          case e => throw new IllegalArgumentException(s"non-string array element '$e' in: $line")
        })
      case v if v.matches("-?\\d+") => TInt(v.toLong)
      case v => throw new IllegalArgumentException(s"unsupported TOML value '$v' in: $line")
    }
    text.linesIterator.map(stripComment).map(_.trim).filter(_.nonEmpty).foreach {
      case header(name) => section = name
      case kv(k, raw) =>
        out.getOrElseUpdate(section, scala.collection.mutable.Map.empty)
          .update(k, value(raw, s"$section.$k"))
      case line => throw new IllegalArgumentException(s"unparseable TOML line: '$line'")
    }
    out.view.mapValues(_.toMap).toMap
  }

  /** Parse TOML text over the built-in defaults: absent sections/keys keep
    * their default.toml values, exactly like serde's struct defaults. */
  def parse(text: String): EngineConfig = {
    val t = parseToml(text)
    def str(sec: String, key: String, dflt: String): String = t.get(sec).flatMap(_.get(key)) match {
      case Some(TStr(v)) => v
      case Some(other) => throw new IllegalArgumentException(s"$sec.$key: expected string, got $other")
      case None => dflt
    }
    def int(sec: String, key: String, dflt: Long): Long = t.get(sec).flatMap(_.get(key)) match {
      case Some(TInt(v)) => v
      case Some(other) => throw new IllegalArgumentException(s"$sec.$key: expected int, got $other")
      case None => dflt
    }
    // Int-ranged fields (ports, connection counts): a bare .toInt would
    // BIT-TRUNCATE an out-of-range TOML value to some unrelated number —
    // "type mismatches fail loudly" must include range
    def int32(sec: String, key: String, dflt: Long): Int = {
      val v = int(sec, key, dflt)
      if (v < Int.MinValue || v > Int.MaxValue)
        throw new IllegalArgumentException(
          s"$sec.$key: $v is outside the 32-bit int range")
      v.toInt
    }
    def bool(sec: String, key: String, dflt: Boolean): Boolean = t.get(sec).flatMap(_.get(key)) match {
      case Some(TBool(v)) => v
      case Some(other) => throw new IllegalArgumentException(s"$sec.$key: expected bool, got $other")
      case None => dflt
    }
    def arr(sec: String, key: String, dflt: Seq[String]): Seq[String] = t.get(sec).flatMap(_.get(key)) match {
      case Some(TArr(v)) => v
      case Some(TStr(v)) => Seq(v)
      case Some(other) => throw new IllegalArgumentException(s"$sec.$key: expected array, got $other")
      case None => dflt
    }
    val d = default
    EngineConfig(
      tracing = TracingConfig(
        level = str("tracing", "level", d.tracing.level),
        format = str("tracing", "format", d.tracing.format),
        withLevel = bool("tracing", "with_level", d.tracing.withLevel),
        withTarget = bool("tracing", "with_target", d.tracing.withTarget),
        withThreadIds = bool("tracing", "with_thread_ids", d.tracing.withThreadIds),
        withLineNumber = bool("tracing", "with_line_number", d.tracing.withLineNumber),
        withFile = bool("tracing", "with_file", d.tracing.withFile)),
      broker = BrokerConfig(
        clientPort = int32("nats", "client_port", d.broker.clientPort),
        serverPort = int32("nats", "server_port", d.broker.serverPort),
        username = str("nats", "username", d.broker.username),
        password = str("nats", "password", d.broker.password),
        host = str("nats", "host", d.broker.host),
        queue = str("nats", "queue", d.broker.queue),
        subjects = arr("nats", "subjects", d.broker.subjects),
        consumerName = str("nats", "consumer_name", d.broker.consumerName),
        streamConfig = StreamEnvelopeConfig(
          name = str("nats.stream_config", "name", d.broker.streamConfig.name),
          retention = str("nats.stream_config", "retention", d.broker.streamConfig.retention),
          discard = str("nats.stream_config", "discard", d.broker.streamConfig.discard),
          storage = str("nats.stream_config", "storage", d.broker.streamConfig.storage),
          noAck = bool("nats.stream_config", "no_ack", d.broker.streamConfig.noAck),
          maxConsumers = int32("nats.stream_config", "max_consumers",
            d.broker.streamConfig.maxConsumers),
          maxAge = str("nats.stream_config", "max_age", d.broker.streamConfig.maxAge),
          needCreate = bool("nats.stream_config", "need_create",
            d.broker.streamConfig.needCreate))),
      warehouse = WarehouseConfig(
        host = str("clickhouse", "host", d.warehouse.host),
        port = int32("clickhouse", "port", d.warehouse.port),
        user = str("clickhouse", "user", d.warehouse.user),
        password = str("clickhouse", "password", d.warehouse.password),
        database = str("clickhouse", "database", d.warehouse.database),
        maxOpenConns = int32("clickhouse", "max_open_conns", d.warehouse.maxOpenConns),
        maxIdleConns = int32("clickhouse", "max_idle_conns", d.warehouse.maxIdleConns),
        debug = bool("clickhouse", "debug", d.warehouse.debug)),
      batcher = BatcherConfig(
        maxRows = int("batcher", "max_rows", d.batcher.maxRows),
        maxBytes = int("batcher", "max_bytes", d.batcher.maxBytes),
        flushIntervalMs = int("batcher", "flush_interval_ms", d.batcher.flushIntervalMs)),
      compaction = CompactionConfig(
        enabled = bool("compaction", "enabled", d.compaction.enabled),
        intervalMs = int("compaction", "interval_ms", d.compaction.intervalMs),
        maxFiles = int32("compaction", "max_files", d.compaction.maxFiles),
        targetBytes = int("compaction", "target_bytes", d.compaction.targetBytes)))
  }
}
