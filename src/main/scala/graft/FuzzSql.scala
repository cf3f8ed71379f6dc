package graft

/** Spark side of the differential SQL fuzzer (tools/difffuzz.py): run
  * every `.sql` statement under `sqlDir` over the registered TPC-H views and
  * dump one parquet dir per query in the Verify layout, so the fuzzer
  * can reuse tools/check.py's driver-shaped compare against DuckDB
  * executing the identical SQL text. A query that fails to run writes
  * nothing — check.py then reports "no spark output", which is the
  * honest verdict (the grammar is supposed to stay inside the dialect
  * intersection; a parse/analysis divergence IS a finding). */
object FuzzSql {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, sqlDir, outDir) = args
    val spark = EngineSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt,
      appName = "graft-fuzz")
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region")
      .foreach(t => Tables(spark, sfDir, t).createOrReplaceTempView(t))
    new java.io.File(outDir).mkdirs()
    val files = new java.io.File(sqlDir).listFiles()
      .filter(_.getName.endsWith(".sql")).sortBy(_.getName)
    files.foreach { f =>
      val name = f.getName.stripSuffix(".sql")
      val sql = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      // NonFatal only: a parse/analysis/execution error is a finding
      // ("no spark output" = honest divergence), but a fatal JVM error
      // (OOM, LinkageError) must abort the run with a nonzero exit —
      // every query after it would otherwise read as a benign miss from
      // a corrupted JVM (ADVICE r12).
      try spark.sql(sql).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[fuzz] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
