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
    if (expired.nonEmpty)
      graft.plans.ProjectionMaintenance.onBaseMutated(spark, tableDir, "event_date",
        expired.map(_._2.getName.stripPrefix("event_date=")))
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
                userCol: String = "user_id"): PurgeReport =
    deleteWhere(spark, tableDir, col(userCol) === userId)

  /** CH `ALTER TABLE … DELETE WHERE cond` analog — the most-used mutation,
    * completing the triad with [[updateWhere]] and [[expireByAge]]. SQL
    * DELETE semantics: rows where `cond` is TRUE go; rows where it is
    * FALSE or NULL stay (a NULL predicate must never silently delete —
    * same guard purgeUser has always had for NULL user ids). Rewrites
    * ONLY the date partitions containing matching rows — pushdown
    * discovery → ONE batched staging write of the kept rows → manifest →
    * metadata-only swap, with [[resumePurge]] converging an interrupted
    * run. A partition emptied by the delete is removed outright. */
  def deleteWhere(spark: SparkSession, tableDir: String,
                  cond: org.apache.spark.sql.Column): PurgeReport = {
    val f = fs(spark, tableDir)
    resumePurge(f, tableDir)
    val parts = datePartitions(spark, tableDir)
    if (parts.isEmpty) return PurgeReport(Nil, Nil, 0L)
    // pushdown scan: which dates hold matching rows, and how many each
    // (reads only the matching row groups thanks to filter + pruning)
    val affected = discoverAffected(spark, tableDir, parts, cond)
    if (affected.isEmpty) return PurgeReport(Nil, Nil, 0L)
    val affectedDates = affected.map(_._1)
    val deleted = affected.map(_._2).sum
    val affectedPaths = affectedDates.map(d => s"$tableDir/event_date=$d")
    val rows = spark.read.option("basePath", tableDir).parquet(affectedPaths: _*)
    val keptCond = !coalesce(cond, lit(false))
    // ONE filtered job: the staging write is also the census — which
    // dates stayed non-empty comes back from stageAndSwap's staged
    // output, not a second filtered scan of the affected partitions
    val keptDirs = stageAndSwap(f, tableDir, rows.filter(keptCond),
      partitionCols(rows), affectedDates.map(d => s"event_date=$d"))
    graft.plans.ProjectionMaintenance.onBaseMutated(spark, tableDir, "event_date",
      affectedDates)
    val (kept, removed) = affectedDates.map(d => s"event_date=$d")
      .partition(keptDirs)
    PurgeReport(kept, removed, deleted)
  }

  /** Hive's on-disk name for a (possibly null) partition value. */
  private def partDirName(v: Any): String =
    Option(v).map(_.toString).getOrElse("__HIVE_DEFAULT_PARTITION__")

  private def partitionCols(rows: org.apache.spark.sql.DataFrame): Seq[String] =
    Seq("event_date") ++
      (if (rows.columns.contains("ingest_batch")) Seq("ingest_batch") else Nil)

  /** Pushdown discovery shared by the mutation paths: which event_date
    * partitions hold rows matching `cond`, and how many match in each —
    * ONE aggregate job over the full-table scan (the filter and the
    * event_date projection both reach the parquet reader). */
  private def discoverAffected(spark: SparkSession, tableDir: String,
                               parts: Seq[(Option[LocalDate], Path)],
                               cond: org.apache.spark.sql.Column)
      : Seq[(String, Long)] =
    spark.read.option("basePath", tableDir)
      .parquet(parts.map(_._2.toString): _*)
      .filter(cond)
      .groupBy(col("event_date")).count()
      .collect().map(r => (partDirName(r.get(0)), r.getLong(1)))
      .sortBy(_._1).toSeq

  /** Phases 1-3 shared by the mutation paths: batched staging write of
    * the affected partitions' replacement rows, manifest (the point of no
    * return — [[resumePurge]] finishes an interrupted application), then
    * the metadata-only swap ([[applyPurgeSwap]]). */
  /** The swap-vs-remove decision per manifest entry derives from the
    * STAGED OUTPUT — a partition the filter emptied writes no staging
    * dir — so the caller needs no second filtered scan of the originals
    * just to learn which dates survive. Returns the affected dir names
    * that stayed non-empty. */
  private def stageAndSwap(f: org.apache.hadoop.fs.FileSystem, tableDir: String,
                           staged: org.apache.spark.sql.DataFrame,
                           partCols: Seq[String],
                           affectedDirs: Seq[String]): Set[String] = {
    val staging = new Path(tableDir, StagingName)
    f.delete(staging, true)
    staged.write.mode("overwrite")
      .partitionBy(partCols: _*).parquet(staging.toString)
    val present = f.listStatus(staging)
      .map(_.getPath.getName).filter(_.contains("=")).toSet
    val actions = affectedDirs.map(d =>
      s"${if (present(d)) "swap" else "remove"}\t$d")
    val out = f.create(new Path(staging, ManifestName), true)
    try out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    applyPurgeSwap(f, tableDir, staging)
    affectedDirs.toSet.intersect(present)
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
    * is a delete+insert, not a mutation — and every assignment must have
    * the column's exact type (no implicit casts: a widened or mistyped
    * assignment would commit affected partitions with a parquet schema
    * that diverges from the untouched ones, leaving the table unreadable;
    * callers cast explicitly). All validation runs BEFORE any Spark job,
    * so a typo'd cron mutation fails today, not the day its predicate
    * first matches data. */
  def updateWhere(spark: SparkSession, tableDir: String,
                  cond: org.apache.spark.sql.Column,
                  assignments: Map[String, org.apache.spark.sql.Column])
      : MutationReport = {
    require(assignments.nonEmpty, "updateWhere: no assignments")
    val f = fs(spark, tableDir)
    resumePurge(f, tableDir)
    val parts = datePartitions(spark, tableDir)
    if (parts.isEmpty) return MutationReport(Nil, 0L)
    val all = spark.read.option("basePath", tableDir)
      .parquet(parts.map(_._2.toString): _*)
    val partCols = partitionCols(all)
    val badAssign = assignments.keySet.intersect(partCols.toSet)
    require(badAssign.isEmpty,
      s"updateWhere: cannot assign partition columns ${badAssign.mkString(", ")}")
    val unknown = assignments.keySet.diff(all.columns.toSet)
    require(unknown.isEmpty,
      s"updateWhere: unknown columns ${unknown.mkString(", ")}")
    // type check via analysis only — no job runs
    val assignedSchema =
      all.select(assignments.map { case (c, a) => a.as(c) }.toSeq: _*).schema
    assignments.keys.foreach { c =>
      val got = assignedSchema(c).dataType
      val want = all.schema(c).dataType
      require(got == want,
        s"updateWhere: assignment to $c has type ${got.sql}, column is ${want.sql} (cast explicitly)")
    }
    val affected = discoverAffected(spark, tableDir, parts, cond)
    if (affected.isEmpty) return MutationReport(Nil, 0L)
    val affectedDates = affected.map(_._1)
    val nUpdated = affected.map(_._2).sum
    val rows = spark.read.option("basePath", tableDir)
      .parquet(affectedDates.map(d => s"$tableDir/event_date=$d"): _*)
    val mutated = rows.select(rows.columns.toSeq.map { c =>
      assignments.get(c)
        .map(a => when(cond, a).otherwise(col(c)).as(c))
        .getOrElse(col(c))
    }: _*)
    // an update passes every row through, so every affected dir stays
    // present and the derived action is always "swap"
    stageAndSwap(f, tableDir, mutated, partCols,
      affectedDates.map(d => s"event_date=$d"))
    graft.plans.ProjectionMaintenance.onBaseMutated(spark, tableDir, "event_date",
      affectedDates)
    MutationReport(affectedDates.map(d => s"event_date=$d"), nUpdated)
  }

  type Q = (SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Oracled catalog surface: per-date retention census under the 24h
    * max_age envelope anchored at the table's max timestamp (data-defined
    * anchor so the result is deterministic at every SF). `expired = 1`
    * rows are exactly the partitions [[expireByAge]] would drop. */
  val queries: Map[String, Q] = Map(
    // deleteWhere's decision surface as a read-only census: per date, how
    // many rows a representative `ALTER TABLE … DELETE WHERE` predicate
    // (error events below value 50) would remove, how many stay, and
    // whether the partition empties (the manifest's swap-vs-remove call).
    // The predicate is NULLable through `value` — NULL must count as KEPT,
    // pinning the SQL DELETE null semantics the mutation implements.
    "s_mut_delete" -> ((s, d) => {
      val cond = col("event_type") === "error" && col("value") < 50
      graft.Tables.events(s, d)
        .withColumn("event_date", to_date(col("ts")))
        .groupBy("event_date")
        .agg(count(lit(1)).as("n_rows"),
          count(when(coalesce(cond, lit(false)), 1)).as("n_deleted"))
        .select(col("event_date"), col("n_rows"), col("n_deleted"),
          (col("n_rows") - col("n_deleted")).as("n_kept"),
          when(col("n_rows") === col("n_deleted"), 1).otherwise(0)
            .as("removes_partition"))
        .orderBy("event_date")
    }),

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
    "s_mut_delete" ->
      """SELECT CAST(ts AS DATE) AS event_date,
                COUNT(*) AS n_rows,
                COUNT(*) FILTER (WHERE COALESCE(event_type = 'error'
                                                AND value < 50, FALSE)) AS n_deleted,
                COUNT(*) - COUNT(*) FILTER (WHERE COALESCE(event_type = 'error'
                                                           AND value < 50, FALSE)) AS n_kept,
                CASE WHEN COUNT(*) = COUNT(*) FILTER (WHERE COALESCE(event_type = 'error'
                                                                     AND value < 50, FALSE))
                     THEN 1 ELSE 0 END AS removes_partition
         FROM events GROUP BY 1 ORDER BY event_date""",

    "s_ttl_prune" ->
      """WITH c AS (SELECT CAST(max(ts) - INTERVAL 24 HOUR AS DATE) AS cutoff FROM events),
            g AS (SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_rows
                  FROM events GROUP BY 1)
         SELECT event_date, n_rows,
                CASE WHEN event_date < cutoff THEN 1 ELSE 0 END AS expired
         FROM g, c ORDER BY event_date"""
  )
}
