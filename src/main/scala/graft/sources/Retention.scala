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
  * Both report what they touched so callers can audit/undo-check. Both
  * are crash-safe by IDEMPOTENCE rather than atomicity: a re-run after a
  * crash converges to the same end state (expiry re-deletes, the purge's
  * batched overwrite re-replaces and re-removes), and every FS step
  * failure is loud. */
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

  private val StagingName = ".purge-tmp"
  private val ManifestName = "_MANIFEST"

  /** Apply (or re-apply) a purge's partition swap from a completed staging
    * dir. Idempotent metadata-only ops, so a crash ANYWHERE in the swap is
    * recovered by running it again:
    *  - `swap <date-dir>`: staged dir present → replace the final dir with
    *    it; staged dir absent → that swap already completed;
    *  - `remove <date-dir>`: delete the final dir (purge emptied it).
    * The staged kept-rows remain visible on disk until every entry is
    * applied — unlike a dynamic-overwrite commit, whose staging is hidden
    * and unrecoverable if the driver dies between its per-partition
    * delete and rename. */
  private def applyPurgeSwap(f: org.apache.hadoop.fs.FileSystem,
                             tableDir: String, staging: Path): Unit = {
    val manifest = new Path(staging, ManifestName)
    val lines = {
      val in = f.open(manifest)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    lines.foreach { line =>
      val Array(action, dirName) = line.split("\t", 2)
      val finalDir = new Path(tableDir, dirName)
      val stagedDir = new Path(staging, dirName)
      action match {
        case "swap" if f.exists(stagedDir) =>
          if (f.exists(finalDir) && !f.delete(finalDir, true))
            throw new java.io.IOException(s"retention: failed to clear $finalDir for swap")
          if (!f.rename(stagedDir, finalDir))
            throw new java.io.IOException(s"retention: failed to publish $stagedDir -> $finalDir")
        case "swap" => () // already published by a previous (crashed) run
        case "remove" =>
          if (!f.delete(finalDir, true) && f.exists(finalDir))
            throw new java.io.IOException(s"retention: failed to remove emptied $finalDir")
        case other =>
          throw new java.io.IOException(s"retention: bad manifest action '$other'")
      }
    }
    if (!f.delete(staging, true) && f.exists(staging))
      throw new java.io.IOException(s"retention: failed to clean staging $staging")
  }

  /** Recover a purge interrupted mid-swap: a staging dir WITH a manifest
    * holds the complete kept rows — finish applying it. One without a
    * manifest is an incomplete phase-1 write (the originals are untouched)
    * — discard it. */
  private def resumePurge(f: org.apache.hadoop.fs.FileSystem, tableDir: String): Unit = {
    val staging = new Path(tableDir, StagingName)
    if (!f.exists(staging)) return
    if (f.exists(new Path(staging, ManifestName))) applyPurgeSwap(f, tableDir, staging)
    else if (!f.delete(staging, true) && f.exists(staging))
      throw new java.io.IOException(s"retention: failed to discard partial staging $staging")
  }

  /** Remove every row of `userId` from `tableDir`, rewriting only the
    * partitions that contain the user — as ONE batched job, not one job
    * per partition (a user active daily over a year would otherwise run
    * hundreds of serial Spark jobs; here wall-clock is affected-bytes /
    * cluster-throughput regardless of how many partitions are touched):
    *
    *   1. per-partition stats aggregate over the affected dirs (exact
    *      audit count + which date partitions the purge empties);
    *   2. ONE batched job writes the kept rows to a VISIBLE staging dir
    *      (`.purge-tmp/event_date=…/[ingest_batch=…]`), then a manifest
    *      records the swap/remove action per affected date;
    *   3. the swap is pure metadata — per affected date, replace (or
    *      remove) the final dir ([[applyPurgeSwap]]).
    *
    * Crash-safe at every window: before the manifest exists the originals
    * are untouched (staging is discarded); after it exists the staging
    * holds the complete kept rows and [[resumePurge]] — run at the start
    * of every purgeUser/expireByAge — finishes the swap. NULL-user rows
    * are kept (`=!=` alone evaluates NULL → dropped, which would silently
    * delete rows belonging to no one). */
  def purgeUser(spark: SparkSession, tableDir: String, userId: Long,
                userCol: String = "user_id"): PurgeReport = {
    val f = fs(spark, tableDir)
    resumePurge(f, tableDir)
    val parts = datePartitions(spark, tableDir)
    if (parts.isEmpty) return PurgeReport(Nil, Nil, 0L)
    // a null partition value is Hive's default partition on disk
    def dirName(v: Any): String =
      Option(v).map(_.toString).getOrElse("__HIVE_DEFAULT_PARTITION__")
    // pushdown scan: which dates hold the user? (reads only the user's
    // row groups thanks to the parquet filter + column pruning)
    val affectedDates = spark.read.option("basePath", tableDir)
      .parquet(parts.map(_._2.toString): _*)
      .filter(col(userCol) === userId)
      .select("event_date").distinct()
      .collect().map(r => dirName(r.get(0))).sorted
    if (affectedDates.isEmpty) return PurgeReport(Nil, Nil, 0L)
    val affectedPaths = affectedDates.map(d => s"$tableDir/event_date=$d")
    val rows = spark.read.option("basePath", tableDir).parquet(affectedPaths: _*)
    val partCols = Seq("event_date") ++
      (if (rows.columns.contains("ingest_batch")) Seq("ingest_batch") else Nil)
    val keptCond = col(userCol) =!= userId || col(userCol).isNull
    // one aggregate pass: exact audit count + which dates stay non-empty
    val stats = rows.groupBy(col("event_date"))
      .agg(sum(when(col(userCol) === userId, 1L).otherwise(0L)).as("n_user"),
        sum(when(keptCond, 1L).otherwise(0L)).as("n_kept"))
      .collect()
      .map(r => (dirName(r.get(0)), r.getAs[Long]("n_user"), r.getAs[Long]("n_kept")))
    val purged = stats.map(_._2).sum
    val keptDates = stats.filter(_._3 > 0).map(_._1).toSet
    // phase 1: batched staging write of every kept row (affected dates
    // only); emptied dates simply have no staged dir
    val staging = new Path(tableDir, StagingName)
    f.delete(staging, true)
    rows.filter(keptCond).write.mode("overwrite")
      .partitionBy(partCols: _*).parquet(staging.toString)
    // phase 2: manifest = the point of no return (resume applies it)
    val manifest = affectedDates.map { d =>
      val action = if (keptDates(d)) "swap" else "remove"
      s"$action\tevent_date=$d"
    }
    val out = f.create(new Path(staging, ManifestName), true)
    try out.write((manifest.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    // phase 3: metadata-only swap
    applyPurgeSwap(f, tableDir, staging)
    PurgeReport(affectedDates.filter(keptDates).map(d => s"event_date=$d"),
      affectedDates.filterNot(keptDates).map(d => s"event_date=$d"), purged)
  }

  final case class MutationReport(datesRewritten: Seq[String], rowsUpdated: Long)

  /** CH `ALTER TABLE … UPDATE col = expr WHERE cond` analog (the mutation
    * sibling of [[purgeUser]] — e.g. pseudonymize a user instead of
    * deleting them): rewrite ONLY the date partitions containing rows
    * matching `cond`, applying `assignments` to the matching rows and
    * passing everything else through byte-identical. Same discovery →
    * staged-write → manifest → metadata-swap machinery and the same
    * crash-safety argument as purgeUser (an update never empties a
    * partition, so every manifest action is a swap). Partition columns
    * cannot be assigned — that would MOVE rows between partitions, which
    * is a delete+insert, not a mutation. */
  def updateWhere(spark: SparkSession, tableDir: String,
                  cond: org.apache.spark.sql.Column,
                  assignments: Map[String, org.apache.spark.sql.Column])
      : MutationReport = {
    require(assignments.nonEmpty, "updateWhere: no assignments")
    val f = fs(spark, tableDir)
    resumePurge(f, tableDir)
    val parts = datePartitions(spark, tableDir)
    if (parts.isEmpty) return MutationReport(Nil, 0L)
    def dirName(v: Any): String =
      Option(v).map(_.toString).getOrElse("__HIVE_DEFAULT_PARTITION__")
    val affectedDates = spark.read.option("basePath", tableDir)
      .parquet(parts.map(_._2.toString): _*)
      .filter(cond)
      .select("event_date").distinct()
      .collect().map(r => dirName(r.get(0))).sorted
    if (affectedDates.isEmpty) return MutationReport(Nil, 0L)
    val affectedPaths = affectedDates.map(d => s"$tableDir/event_date=$d")
    val rows = spark.read.option("basePath", tableDir).parquet(affectedPaths: _*)
    val partCols = Seq("event_date") ++
      (if (rows.columns.contains("ingest_batch")) Seq("ingest_batch") else Nil)
    val badAssign = assignments.keySet.intersect(partCols.toSet)
    require(badAssign.isEmpty,
      s"updateWhere: cannot assign partition columns ${badAssign.mkString(", ")}")
    val unknown = assignments.keySet.diff(rows.columns.toSet)
    require(unknown.isEmpty,
      s"updateWhere: unknown columns ${unknown.mkString(", ")}")
    val nUpdated = rows.filter(cond).count()
    val mutated = rows.select(rows.columns.toSeq.map { c =>
      assignments.get(c)
        .map(a => when(cond, a).otherwise(col(c)).as(c))
        .getOrElse(col(c))
    }: _*)
    val staging = new Path(tableDir, StagingName)
    f.delete(staging, true)
    mutated.write.mode("overwrite")
      .partitionBy(partCols: _*).parquet(staging.toString)
    val manifest = affectedDates.map(d => s"swap\tevent_date=$d")
    val out = f.create(new Path(staging, ManifestName), true)
    try out.write((manifest.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    applyPurgeSwap(f, tableDir, staging)
    MutationReport(affectedDates.map(d => s"event_date=$d"), nUpdated)
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
