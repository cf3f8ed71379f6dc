package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` keys follow SURVEY §2 operator IDs; every key with a DuckDB
  * oracle appears in `oracleSql` with identical column names/types and a
  * deterministic ORDER BY (SURVEY §5 determinism rules).
  */
object SparkEntry {

  /** Flagship (SURVEY §7-M1): hourly unique-user engagement — dedup by
    * event_id (O-W1, the at-least-once duplicate view) → hour bucket
    * (O-X2) → hash agg with exact distinct (O-A1/A2) → sort (O-S1).
    * Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val w = Window.partitionBy("event_id").orderBy("ts", "user_id")
    e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))
      .orderBy("hour", "event_type")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Windows.queries ++
      operators.EventAnalytics.queries ++
      operators.IncrementalRollup.queries ++
      sources.ProtoSourceQueries.queries ++ sources.Retention.queries ++
      pipeline.TextDedup.queries ++ pipeline.Similarity.queries ++
      pipeline.TextAnalysis.queries ++ pipeline.Multimodal.queries ++
      pipeline.Packing.queries ++ pipeline.EndToEnd.queries ++
      pipeline.Curation.queries ++ pipeline.Shards.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.Windows.oracles ++
      operators.EventAnalytics.oracles ++
      operators.IncrementalRollup.oracles ++
      sources.ProtoSourceQueries.oracles ++ sources.Retention.oracles ++
      pipeline.TextDedup.oracles ++ pipeline.Similarity.oracles ++
      pipeline.TextAnalysis.oracles ++ pipeline.Multimodal.oracles ++
      pipeline.Packing.oracles ++ pipeline.EndToEnd.oracles ++
      pipeline.Curation.oracles ++ pipeline.Shards.oracles
}
