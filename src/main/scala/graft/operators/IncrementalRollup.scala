package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ClickHouse's AggregatingMergeTree pattern — `uniqState(...)` partial
  * aggregate columns merged at read time with `uniqMerge` — re-expressed
  * with Spark's DataSketches built-ins: `hll_sketch_agg` produces a
  * mergeable BINARY sketch column, `hll_union_agg` + `hll_sketch_estimate`
  * finalize it. (CH 22.3 capability [implied] by the reference's event
  * tables; the canonical CH use is exactly this daily-uniques cube.)
  *
  * Scale shape: each ingest batch (or day) reduces to one tiny partial
  * row per group — a 100 TB fact stream becomes a KB-scale rollup table —
  * and the merge is associative/commutative, so re-aggregation
  * distributes, never revisits raw data, and tolerates at-least-once
  * batch duplication at the partial level (idempotent overwrite per
  * batch, see streaming.Ingest).
  */
object IncrementalRollup {

  /** Default sketch precision: lgK=12 ⇒ ~1.6% relative error, 4KB max. */
  val LgK = 12

  /** Per-batch/day partial: group keys + count + HLL sketch-as-column.
    * Append one of these per micro-batch; never touch raw rows again. */
  def partial(events: DataFrame, keys: Seq[String],
              distinctCol: String): DataFrame =
    events.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        hll_sketch_agg(col(distinctCol), LgK).as("uniq_state"))

  /** Merge partials to final estimates over (possibly coarser) keys —
    * the uniqMerge step. Partials from any batching of the same rows
    * merge to identical sketches (HLL registers are max-combined). */
  def merged(partials: DataFrame, keys: Seq[String]): DataFrame =
    partials.groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"),
        hll_sketch_estimate(hll_union_agg(col("uniq_state"), true))
          .as("approx_uniq"))

  type Q = (SparkSession, String) => DataFrame

  /** Rows-only catalog entry (sketch estimates are engine-specific):
    * daily user cube built as 4 independent partials (simulating 4 ingest
    * batches) then merged — CatalogSpec checks the estimate against the
    * exact distinct count. */
  val queries: Map[String, Q] = Map(
    "o_a12_sketch_merge" -> ((s, d) => {
      val e = Tables.events(s, d).withColumn("event_date", to_date(col("ts")))
      // simulate per-batch partials with an arbitrary 4-way split
      val parts = (0 until 4).map(i =>
        partial(e.filter(pmod(col("event_id"), lit(4)) === i),
          Seq("event_date", "event_type"), "user_id"))
      merged(parts.reduce(_ unionByName _), Seq("event_date", "event_type"))
        .orderBy("event_date", "event_type")
    })
  )
}
