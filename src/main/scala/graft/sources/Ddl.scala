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
    * seconds `timestamp` promoted to TimestampType + event_date partition. */
  def tableSchema(table: String): StructType = {
    val wire = EventSchemas.tables(table)
    StructType(wire.fields.map {
      case StructField("timestamp", LongType, n, m) => StructField("timestamp", TimestampType, n, m)
      case f => f
    } :+ StructField("event_date", DateType, nullable = true))
  }

  /** CREATE TABLE IF NOT EXISTS for all 9 event tables under `rootDir`.
    * Re-running is a no-op (reference migrations are idempotent too). */
  def createEventTables(spark: SparkSession, rootDir: String): Unit =
    EventSchemas.tables.keys.foreach { table =>
      val cols = tableSchema(table).fields
        .filterNot(_.name == "event_date")
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      // materialize the location so MSCK/scans never hit a missing dir
      val loc = new org.apache.hadoop.fs.Path(s"$rootDir/$table")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(loc)
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS $table ($cols, `event_date` DATE)
            USING parquet
            PARTITIONED BY (event_date)
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
