package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** `system.parts` analog — the ops introspection surface every MergeTree
  * deployment lives in (`SELECT … FROM system.parts WHERE table = …`;
  * [implied] CH 22.3 over the migration DDLs): per-partition file count
  * and byte size for a date-partitioned table, the inputs to compaction
  * scheduling (small-file pressure), retention auditing, and capacity
  * planning.
  *
  * Driver-side directory listing only — O(#partitions + #files) metadata
  * calls through the Hadoop FS client (the same cost class as Spark's own
  * file-index refresh), zero data read. At object-store scale the listing
  * is the canonical pain point; this is the seam where a manifest/catalog
  * (or S3 inventory) implementation would slot in. */
object Parts {

  final case class PartInfo(partition: String, n_files: Long, bytes: Long)

  /** One row per `event_date=*` partition dir (or per the bare table dir
    * when unpartitioned): logical partition name, parquet file count,
    * total bytes. Sorted by partition name. */
  def forTable(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty[PartInfo].toDF()
    val partDirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    def census(dir: Path): (Long, Long) = {
      val it = fs.listFiles(dir, true)
      var n = 0L; var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) { n += 1; bytes += f.getLen }
      }
      (n, bytes)
    }
    val rows =
      if (partDirs.isEmpty) {
        val (n, b) = census(root)
        Seq(PartInfo("<unpartitioned>", n, b))
      } else partDirs.map { s =>
        val (n, b) = census(s.getPath)
        PartInfo(s.getPath.getName, n, b)
      }
    rows.sortBy(_.partition).toDF()
  }

  /** Partitions whose file count exceeds `maxFiles` — the compaction
    * work queue (`sources.Compaction` consumes dirs like these). */
  def needingCompaction(spark: SparkSession, tableDir: String,
                        maxFiles: Int): Seq[String] = {
    import org.apache.spark.sql.functions.col
    forTable(spark, tableDir)
      .filter(col("n_files") > maxFiles)
      .collect().map(_.getString(0)).toSeq
  }
}
