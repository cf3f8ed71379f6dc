package graft.sources

import java.time.{Duration, LocalDate}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data retention over the date-partitioned event tables — the reference
  * bounds data age at the BROKER (`max_age = "24h"`, config/default.toml:27,
  * JetStream workqueue retention src/nats.rs:29-52); once the storage tier
  * owns the data, the same envelope must be enforced there. Two paths:
  *
  *  - [[expireByAge]]: age-based partition expiry. Partition granularity
  *    (event_date=YYYY-MM-DD), directory deletes only — O(#partitions)
  *    metadata work, zero data read, exactly how a 100 TB table must age
  *    out (never row-level deletes over the full table).
  *  - [[purgeUser]]: delete-by-user (the compliance sibling of
  *    d_pii_scrub). Affected date partitions are discovered with a
  *    predicate-pushdown scan, and ONLY those partitions are rewritten;
  *    cost is bounded by the user's partition footprint, not table size.
  *
  * Both report what they touched so callers can audit/undo-check. The
  * per-partition swap (write tmp → delete → rename) is not atomic: a
  * crash mid-swap leaves the tmp dir for a re-run to resume, never a
  * half-rewritten partition — same non-atomic-directory tradeoff as the
  * proto sink's commit, documented there. */
object Retention {

  final case class ExpiryReport(cutoff: LocalDate, dropped: Seq[String], retained: Seq[String])
  final case class PurgeReport(datesRewritten: Seq[String], datesRemoved: Seq[String],
                               rowsPurged: Long)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** All event_date=* partition dirs under `tableDir`, with their parsed
    * date where the suffix IS a date. A non-date suffix (Hive's
    * __HIVE_DEFAULT_PARTITION__ from a null timestamp) must not wedge
    * retention: it simply never expires by age, but is still scanned and
    * rewritten by [[purgeUser]]. */
  private def datePartitions(spark: SparkSession, tableDir: String)
      : Seq[(Option[LocalDate], Path)] = {
    val root = new Path(tableDir)
    val f = fs(spark, tableDir)
    if (!f.exists(root)) return Seq.empty
    f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("event_date="))
      .map { s =>
        val suffix = s.getPath.getName.stripPrefix("event_date=")
        (scala.util.Try(LocalDate.parse(suffix)).toOption, s.getPath)
      }
      .sortBy(_._2.getName)
  }

  /** Drop every event_date partition strictly older than `anchor - maxAge`
    * (date granularity, matching the partition axis). `anchor` defaults to
    * wall clock like JetStream's max_age; tests pin it. A failed delete is
    * an error, not a silently-wrong report — the job is idempotent, rerun
    * it after fixing the cause. */
  def expireByAge(spark: SparkSession, tableDir: String, maxAge: Duration,
                  anchor: java.time.Instant = java.time.Instant.now()): ExpiryReport = {
    val cutoff = anchor.minus(maxAge).atZone(java.time.ZoneOffset.UTC).toLocalDate
    val f = fs(spark, tableDir)
    resumeCrashedSwaps(f, tableDir)
    val (expired, retained) = datePartitions(spark, tableDir)
      .partition { case (d, _) => d.exists(_.isBefore(cutoff)) }
    expired.foreach { case (_, p) =>
      if (!f.delete(p, true) && f.exists(p))
        throw new java.io.IOException(s"retention: failed to delete expired partition $p")
    }
    ExpiryReport(cutoff, expired.map(_._2.getName), retained.map(_._2.getName))
  }

  /** Config-driven form: the stream envelope's max_age (default.toml:27). */
  def expireByAge(spark: SparkSession, tableDir: String, cfg: graft.EngineConfig): ExpiryReport =
    expireByAge(spark, tableDir, cfg.broker.streamConfig.maxAgeDuration)

  /** Finish any swap a crashed [[purgeUser]] left half-done: a
    * `.purge-tmp-<partition>` dir whose target partition is MISSING sits
    * between the delete and rename steps — its contents are the complete
    * kept rows, so the rename completes the purge. A tmp whose target
    * still exists is a stale/partial write from before the delete step
    * (the target still holds the full pre-purge data) — discard it and
    * let the purge re-run. */
  private def resumeCrashedSwaps(f: org.apache.hadoop.fs.FileSystem, tableDir: String): Unit = {
    val root = new Path(tableDir)
    if (!f.exists(root)) return
    f.listStatus(root).filter(_.getPath.getName.startsWith(".purge-tmp-")).foreach { s =>
      val target = new Path(tableDir, s.getPath.getName.stripPrefix(".purge-tmp-"))
      if (!f.exists(target)) {
        if (!f.rename(s.getPath, target))
          throw new java.io.IOException(
            s"retention: failed to resume crashed purge swap ${s.getPath} -> $target")
      } else if (!f.delete(s.getPath, true) && f.exists(s.getPath))
        // a surviving stale tmp could be resurrected as a live partition
        // by a LATER resume once its target is expired — never leave it
        throw new java.io.IOException(
          s"retention: failed to discard stale purge tmp ${s.getPath}")
    }
  }

  /** Remove every row of `userId` from `tableDir`, rewriting only the date
    * partitions that contain the user. A partition left empty by the purge
    * is removed outright. Crash-safe: each partition swap goes
    * write-tmp → delete → rename, and the NEXT purgeUser/expireByAge call
    * resumes a swap interrupted between the last two steps
    * ([[resumeCrashedSwaps]]); every FS step failure is loud. */
  def purgeUser(spark: SparkSession, tableDir: String, userId: Long,
                userCol: String = "user_id"): PurgeReport = {
    val f = fs(spark, tableDir)
    resumeCrashedSwaps(f, tableDir)
    val parts = datePartitions(spark, tableDir)
    if (parts.isEmpty) return PurgeReport(Nil, Nil, 0L)
    // pushdown scan: which dates hold the user? (reads only the user's
    // row groups thanks to the parquet filter + column pruning)
    val affected = spark.read.option("basePath", tableDir)
      .parquet(parts.map(_._2.toString): _*)
      .filter(col(userCol) === userId)
      .select("event_date").distinct()
      .collect()
      // a null partition value is Hive's default partition on disk
      .map(r => Option(r.get(0)).map(_.toString).getOrElse("__HIVE_DEFAULT_PARTITION__"))
      .sorted
    var purged = 0L
    val (rewritten, removed) = (Seq.newBuilder[String], Seq.newBuilder[String])
    affected.foreach { d =>
      val partDir = new Path(tableDir, s"event_date=$d")
      // one physical read per partition: counts and the rewrite share the
      // cached blocks (the partition is the user's footprint — small)
      val rows = spark.read.option("basePath", tableDir)
        .parquet(partDir.toString).persist()
      try {
        // exact audit count, and NULL-user rows are kept: `=!=` alone
        // evaluates to NULL (→ dropped) for them, which would silently
        // delete rows that do NOT belong to the target user
        val nPurged = rows.filter(col(userCol) === userId).count()
        val kept = rows.filter(col(userCol) =!= userId || col(userCol).isNull)
          .drop("event_date") // constant within the partition dir
        val tmp = new Path(tableDir, s".purge-tmp-event_date=$d")
        f.delete(tmp, true)
        val keptCount = kept.count()
        if (keptCount > 0) {
          val w = kept.write.mode("overwrite")
          (if (rows.columns.contains("ingest_batch")) w.partitionBy("ingest_batch") else w)
            .parquet(tmp.toString)
          if (!f.delete(partDir, true))
            throw new java.io.IOException(s"retention: failed to delete $partDir for swap")
          if (!f.rename(tmp, partDir))
            throw new java.io.IOException(s"retention: failed to publish $tmp -> $partDir")
          rewritten += s"event_date=$d"
        } else {
          if (!f.delete(partDir, true))
            throw new java.io.IOException(s"retention: failed to remove emptied $partDir")
          removed += s"event_date=$d"
        }
        purged += nPurged
      } finally rows.unpersist()
    }
    PurgeReport(rewritten.result(), removed.result(), purged)
  }

  type Q = (SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Oracled catalog surface: per-date retention census under the 24h
    * max_age envelope anchored at the table's max timestamp (data-defined
    * anchor so the result is deterministic at every SF). `expired = 1`
    * rows are exactly the partitions [[expireByAge]] would drop. */
  val queries: Map[String, Q] = Map(
    "s_ttl_prune" -> ((s, d) => {
      val e = graft.Tables.events(s, d).withColumn("event_date", to_date(col("ts")))
      val cutoff = e.agg(max(col("ts")).as("mx"))
        .select(to_date(col("mx") - expr("INTERVAL 24 HOURS")).as("cutoff"))
      e.groupBy("event_date").agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(cutoff))
        .select(col("event_date"), col("n_rows"),
          when(col("event_date") < col("cutoff"), 1).otherwise(0).as("expired"))
        .orderBy("event_date")
    })
  )

  val oracles: Map[String, String] = Map(
    "s_ttl_prune" ->
      """WITH c AS (SELECT CAST(max(ts) - INTERVAL 24 HOUR AS DATE) AS cutoff FROM events),
            g AS (SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_rows
                  FROM events GROUP BY 1)
         SELECT event_date, n_rows,
                CASE WHEN event_date < cutoff THEN 1 ELSE 0 END AS expired
         FROM g, c ORDER BY event_date"""
  )
}
