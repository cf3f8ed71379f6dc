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
}
