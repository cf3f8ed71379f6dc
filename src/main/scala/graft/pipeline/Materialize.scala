package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Catalog queries run 70-at-a-time in one session (Bench/Verify), so a
  * query body that persists an intermediate must release it before the next
  * query runs, or cached blocks accumulate for the whole catalog pass.
  * `drop` runs the (small-result) plan eagerly, unpersists the caches it
  * consumed, and hands back the result as a local DataFrame — at cluster
  * scale the same discipline is "unpersist after the terminal action". */
private[graft] object Materialize {
  def drop(result: DataFrame, caches: DataFrame*): DataFrame = {
    val rows = java.util.Arrays.asList(result.collect(): _*)
    val out = result.sparkSession.createDataFrame(rows, result.schema)
    caches.foreach(_.unpersist())
    out
  }
}
