package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory so the same code runs at
  * sf0.001 (smoke), sf0.01 (t2 correctness) and sf0.1+ (bench). At real
  * scale these would be partitioned tables behind a catalog; the parquet
  * scan path is identical (vectorized reader, predicate pushdown, column
  * pruning all apply).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    // events must always route through the nanos-normalizing loader;
    // a raw read of it is order-dependent (works only if some earlier
    // query already set the nanosAsLong conf) and otherwise throws
    // PARQUET_TYPE_ILLEGAL.
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  /** events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    * parquet reader rejects; read the raw int64 nanos and truncate to
    * microsecond TimestampType (same truncation DuckDB applies). Integer
    * `div` — a double roundtrip would lose precision above 2^53 ns.
    * At real scale the ingest layer would write micros directly, keeping
    * ts filters pushdown-eligible. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
