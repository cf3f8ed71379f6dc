package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction — the analog of MergeTree's background part
  * merges (the reference's storage engine merges inserted parts
  * continuously; a streaming parquet sink accumulates one file per
  * micro-batch instead — SURVEY §4.2 "ours to schedule").
  *
  * Rewrites a table directory into ~`targetBytes` files, preserving the
  * date-partition layout and re-sorting within partitions by the table's
  * ORDER BY columns so parquet row-group min/max stats stay tight (the
  * data-skipping property the sorted write established). The rewrite
  * goes to a temp dir then swaps atomically-enough for a single writer
  * (streaming query must be paused — same discipline as VACUUM jobs).
  */
object Compaction {

  case class Stats(filesBefore: Long, filesAfter: Long,
                   bytes: Long, rows: Long)

  /** Partition columns as laid out ON DISK, in directory order — walked
    * from `name=value` dir levels, so compaction preserves EVERY level
    * the table actually has (an ingest table is (event_date,
    * ingest_batch); writing back only event_date would flatten the
    * second level into a data column and leave a mixed-depth layout the
    * next replayed batch cannot coexist with). */
  private[sources] def discoverPartitionCols(
      fs: org.apache.hadoop.fs.FileSystem, root: Path): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    var cur = root
    var descend = fs.exists(cur)
    while (descend) {
      val kids = fs.listStatus(cur).filter { s =>
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      kids.find(k => k.isDirectory && k.getPath.getName.contains("=")) match {
        case Some(k) =>
          out += k.getPath.getName.split("=", 2)(0)
          cur = k.getPath
        case None => descend = false
      }
    }
    out.toSeq
  }

  def compact(spark: SparkSession, tablePath: String,
              sortCols: Seq[String] = Seq("timestamp", "event_name"),
              partitionCol: Option[String] = Some("event_date"),
              targetBytes: Long = 128L * 1024 * 1024): Stats = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new Path(tablePath)
    val fs = path.getFileSystem(hconf)
    val tmp = new Path(path.getParent, s".${path.getName}_compact_tmp")
    val bak = new Path(path.getParent, s".${path.getName}_compact_bak")

    // crash recovery BEFORE touching anything: a previous run that died
    // between the two swap renames leaves the table missing and the data
    // in .bak — restore it; one that died after the swap but before
    // cleanup leaves a stale .bak next to a healthy table — drop it.
    if (!fs.exists(path) && fs.exists(bak)) {
      if (!fs.rename(bak, path))
        throw new IllegalStateException(
          s"cannot restore $path from interrupted compaction backup $bak")
    } else if (fs.exists(bak)) {
      fs.delete(bak, true)
    }

    // hidden-aware shared walk: _temporary leftovers from a crashed write
    // must not count toward byte math or file counts
    def parquetFiles(p: Path) = Parts.visibleParquetFiles(fs, p)

    val before = parquetFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    // row count rides the rewrite job as an observed metric — a separate
    // df.count() would read the whole table a second time just to fill
    // Stats.rows, doubling the maintenance path's I/O
    val obs = new org.apache.spark.sql.Observation(
      s"compact-${path.getName}-${System.nanoTime()}")
    val df = spark.read.parquet(tablePath)
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    fs.delete(tmp, true)

    // Partition layout: whatever the table has ON DISK wins (all levels
    // preserved); `partitionCol` is the fallback for a layout-less dir
    // whose caller wants one introduced.
    val pcs = {
      val discovered = discoverPartitionCols(fs, path)
      if (discovered.nonEmpty) discovered
      else partitionCol.toSeq.filter(df.columns.contains)
    }

    // Range-partition over (partition cols ++ sort cols): output splits are
    // bounded by nFiles regardless of how many rows share one date — a
    // hash-by-date repartition would cap non-empty outputs at the number of
    // distinct dates and ignore targetBytes within a hot date. Ranges also
    // cluster each date's rows contiguously, so per-date file counts stay
    // proportional to per-date bytes and the within-partition sort keeps
    // row-group min/max stats tight.
    val keys = (pcs ++ sortCols.filter(df.columns.contains)).map(col)
    val shaped =
      if (keys.nonEmpty)
        df.repartitionByRange(nFiles, keys: _*).sortWithinPartitions(keys: _*)
      else df.repartition(nFiles)
    val writer =
      if (pcs.nonEmpty) shaped.write.partitionBy(pcs: _*) else shaped.write
    writer.mode("overwrite").parquet(tmp.toString)

    // swap: old → .bak, tmp → table, drop .bak
    if (!fs.rename(path, bak)) throw new IllegalStateException(s"cannot move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // restore
      throw new IllegalStateException(s"cannot move compacted data into $path")
    }
    fs.delete(bak, true)

    val rows = obs.get("rows").asInstanceOf[Long]
    Stats(before.size.toLong, parquetFiles(path).size.toLong, totalBytes, rows)
  }
}
