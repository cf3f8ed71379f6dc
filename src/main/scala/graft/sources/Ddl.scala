package graft.sources

import graft.streaming.EventSchemas
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Idempotent table DDL bootstrap (SURVEY S-SCAN2): the Spark analog of
  * the reference's `CREATE TABLE IF NOT EXISTS … ENGINE = MergeTree()
  * ORDER BY (timestamp, event_name)` migrations (migrations/002..011).
  *
  * Tables are external parquet, partitioned by event_date (the pruning
  * axis); the MergeTree ORDER BY becomes the sorted-write discipline in
  * Ingest plus Compaction — physical layout, not DDL, in Spark. */
object Ddl {

  /** Catalog (storage) schema for a table: wire schema with the epoch-
    * seconds `timestamp` promoted to TimestampType + the two partition
    * columns the ingest sink lays down — event_date (pruning axis) over
    * ingest_batch (idempotent-replay axis, see [[graft.streaming.Ingest]]). */
  def tableSchema(table: String): StructType = {
    val wire = EventSchemas.tables(table)
    StructType(wire.fields.map {
      case StructField("timestamp", LongType, n, m) => StructField("timestamp", TimestampType, n, m)
      case f => f
    } :+ StructField("event_date", DateType, nullable = true)
      :+ StructField("ingest_batch", LongType, nullable = true))
  }

  /** CREATE TABLE IF NOT EXISTS for all 9 event tables under `rootDir`.
    * Re-running is a no-op (reference migrations are idempotent too). */
  def createEventTables(spark: SparkSession, rootDir: String): Unit =
    EventSchemas.tables.keys.foreach { table =>
      val cols = tableSchema(table).fields
        .filterNot(f => f.name == "event_date" || f.name == "ingest_batch")
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      // materialize the location so MSCK/scans never hit a missing dir
      val loc = new org.apache.hadoop.fs.Path(s"$rootDir/$table")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(loc)
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS $table
            ($cols, `event_date` DATE, `ingest_batch` BIGINT)
            USING parquet
            PARTITIONED BY (event_date, ingest_batch)
            LOCATION '$rootDir/$table'""")
    }

  /** Register partitions the streaming Ingest wrote directly to the
    * table locations (path-based writes bypass the catalog's partition
    * metadata — MSCK discovers the event_date directories). Run after
    * createEventTables over an ingest output dir, or on a schedule
    * alongside Compaction. */
  def repairEventTables(spark: SparkSession): Unit =
    EventSchemas.tables.keys.foreach { table =>
      spark.sql(s"MSCK REPAIR TABLE $table")
    }
}
