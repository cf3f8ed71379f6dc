package graft.operators

import graft.{Tables, TestSession}
import graft.functions.GraftExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // skew: 90% of rows share one key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, s"v$i"))
      .toDF("k", "v")
    val small = (1 to 200).map(i => (i.toLong, s"dim$i")).toDF("k", "d")
    val plain = big.join(small, Seq("k")).select("k", "v", "d")
      .collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(big, small, "k", parts = 8)
      .select("k", "v", "d").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("salted count equals plain count") {
    val e = Tables.events(spark, sf)
    val plain = e.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedCount(e, "event_type", parts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("CollapseDedup rule removes the redundant second dedup") {
    val e = Tables.events(spark, sf)
    val doubled = e.dropDuplicates(Seq("event_id"))
      .dropDuplicates(Seq("event_id", "user_id"))
    // TestSession runs the full extension path (r17), so CollapseDedup
    // fires as a post-hoc resolution rule DURING analysis — the analyzed
    // plan arrives already collapsed; the rule must also be idempotent
    val analyzed = doubled.queryExecution.analyzed
    assert("Deduplicate".r.findAllIn(analyzed.toString).size == 1,
      s"extension should collapse at analysis:\n$analyzed")
    val collapsed = graft.plans.CollapseDedup(analyzed)
    assert("Deduplicate".r.findAllIn(collapsed.toString).size == 1,
      s"rule must be idempotent, got:\n$collapsed")
    // non-subset keys must NOT collapse (outer (user_id) ⊄ inner (event_id))
    val mixed = e.dropDuplicates(Seq("event_id")).dropDuplicates(Seq("user_id"))
      .queryExecution.analyzed
    assert("Deduplicate".r.findAllIn(graft.plans.CollapseDedup(mixed).toString).size == 2)
    // semantics preserved
    assert(doubled.count() == e.dropDuplicates(Seq("event_id")).count())
  }

  test("simhash64 of a literal constant-folds") {
    GraftExtensions.register(spark)
    val df = spark.sql("SELECT simhash64('a b c') AS h FROM range(3)")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("simhash64"), s"expected constant folding:\n$plan")
  }
}
