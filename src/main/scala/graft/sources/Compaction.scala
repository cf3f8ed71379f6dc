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

  def compact(spark: SparkSession, tablePath: String,
              sortCols: Seq[String] = Seq("timestamp", "event_name"),
              partitionCol: Option[String] = Some("event_date"),
              targetBytes: Long = 128L * 1024 * 1024): Stats = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new Path(tablePath)
    val fs = path.getFileSystem(hconf)

    // hidden-aware shared walk: _temporary leftovers from a crashed write
    // must not count toward byte math or file counts
    def parquetFiles(p: Path) = Parts.visibleParquetFiles(fs, p)

    val before = parquetFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(tablePath)
    val rows = df.count()
    val tmp = new Path(path.getParent, s".${path.getName}_compact_tmp")
    fs.delete(tmp, true)

    // Range-partition over (partition col ++ sort cols): output splits are
    // bounded by nFiles regardless of how many rows share one date — a
    // hash-by-date repartition would cap non-empty outputs at the number of
    // distinct dates and ignore targetBytes within a hot date. Ranges also
    // cluster each date's rows contiguously, so per-date file counts stay
    // proportional to per-date bytes and the within-partition sort keeps
    // row-group min/max stats tight.
    val writer = partitionCol match {
      case Some(pc) if df.columns.contains(pc) =>
        val keys = (pc +: sortCols.filter(df.columns.contains)).map(col)
        df.repartitionByRange(nFiles, keys: _*)
          .sortWithinPartitions(keys: _*)
          .write.partitionBy(pc)
      case _ =>
        val keys = sortCols.filter(df.columns.contains).map(col)
        (if (keys.nonEmpty) df.repartitionByRange(nFiles, keys: _*)
         else df.repartition(nFiles))
          .sortWithinPartitions(keys: _*)
          .write
    }
    writer.mode("overwrite").parquet(tmp.toString)

    // swap: old → .bak, tmp → table, drop .bak
    val bak = new Path(path.getParent, s".${path.getName}_compact_bak")
    fs.delete(bak, true)
    if (!fs.rename(path, bak)) throw new IllegalStateException(s"cannot move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // restore
      throw new IllegalStateException(s"cannot move compacted data into $path")
    }
    fs.delete(bak, true)

    Stats(before.size.toLong, parquetFiles(path).size.toLong, totalBytes, rows)
  }
}
