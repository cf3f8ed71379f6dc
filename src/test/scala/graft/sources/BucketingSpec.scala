package graft.sources

import graft.{Tables, TestSession}
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf).withColumnRenamed("o_orderkey", "l_orderkey")
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(o, "o_bucketed", "l_orderkey", buckets = 8)

    val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"unexpected join strategy:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    // result parity with the unbucketed join
    val expected = li.join(o, "l_orderkey").count()
    assert(joined.count() == expected)

    // the same sort-merge join WITHOUT bucketing does shuffle — the
    // contrast that shows what the bucket layout buys
    val unbucketed = li.hint("merge").join(o.hint("merge"), "l_orderkey")
    assert(unbucketed.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))
  }

  test("ANALYZE TABLE feeds CBO cardinalities (SURVEY §4.2 join reorder)") {
    spark.sql("DROP TABLE IF EXISTS stats_demo")
    val loc = new java.io.File("spark-warehouse/stats_demo")
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    Tables.nation(spark, sf).write.saveAsTable("stats_demo")
    // without stats: only size-in-bytes estimates
    spark.sql("ANALYZE TABLE stats_demo COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_regionkey")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("stats_demo").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)), s"expected rowCount=25, got $stats")
      assert(stats.attributeStats.nonEmpty, "expected per-column stats for the CBO")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }
}
