package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: time individual catalog queries in isolation
  * (`tools/time_queries.sh <sfDir> q1 q2 ...`). Bench measures the whole
  * catalog with min-of-passes; this is the per-query drill-down for plan
  * work — same session config, one timed run per name, no minimum. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQueries <sfDir> <query>...")
    val sf = args.head
    val unknown = args.tail.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")}; valid names: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    val spark: SparkSession = EngineSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-timeq")
    args.tail.foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sf).count()
      println(f"[timeq] $q%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    spark.stop()
  }
}
