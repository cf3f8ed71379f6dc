package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: dump `.explain("formatted")` for catalog queries to
  * files (`PlanDump <sfDir> <outDir> [suffix] q1 q2 ...`). Companion of
  * TimeQueries for plan-shape work — the optimization rounds commit
  * before/after plans under plans/rNN/, and this writes them without a
  * spark-shell session. Suffix is appended to the file name
  * (`<query><suffix>.txt`), e.g. `_before` / `_after`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <sfDir> <outDir> <suffix> <query>...")
    val sf = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    java.nio.file.Files.createDirectories(outDir)
    val spark: SparkSession = EngineSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-plandump")
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"$q$suffix.txt"), plan)
      println(s"[plandump] wrote $q$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
