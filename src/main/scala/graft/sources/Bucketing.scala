package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the co-located-join primitive for repeated
  * big⋈big joins (SURVEY §4.2 / the 100 TB posture: a fact⋈fact join on
  * a pre-bucketed key reads matching buckets on both sides and never
  * shuffles either table; the shuffle is paid once at write time).
  *
  * ClickHouse achieves the same locality with co-sorted MergeTree parts;
  * in Spark the catalog records the bucket spec and the planner drops
  * the Exchange when bucket counts line up.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. The write shuffles
    * once on `key`; every later equi-join between tables bucketed the
    * same way on `key` is exchange-free. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 16): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Co-located join of two same-bucketed tables. The merge hint keeps
    * the demo honest at small test scale (where the planner would rather
    * broadcast); at fact⋈fact scale sort-merge is the chosen strategy
    * anyway and the bucket layout removes both exchanges. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right).hint("merge"), key)
}
