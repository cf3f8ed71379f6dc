package graft.operators

import graft.{Tables, TestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalRollupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("sketch merge law: any batching of the rows merges to the same estimate") {
    val e = Tables.events(spark, sf).withColumn("event_date", to_date(col("ts")))
    val keys = Seq("event_date", "event_type")

    val oneShot = IncrementalRollup.merged(
      IncrementalRollup.partial(e, keys, "user_id"), keys)
      .collect().map(r => (r.getDate(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    // 5-way split on a key uncorrelated with the groups
    val parts = (0 until 5).map(i =>
      IncrementalRollup.partial(e.filter(pmod(col("user_id"), lit(5)) === i), keys, "user_id"))
    val rebatched = IncrementalRollup.merged(parts.reduce(_ unionByName _), keys)
      .collect().map(r => (r.getDate(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    assert(rebatched == oneShot) // exact sketch-merge equality, not approx
  }

  test("o_a25 shape: a segment whose ids are ALL NULL vanishes, matching the oracle's WHERE") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    // bitmap_agg skips NULLs, so without a pre-filter an all-NULL type
    // yields an EMPTY segment row that the oracle (WHERE user_id IS NOT
    // NULL) never sees — the catalog query filters first; pin that here
    val df = Seq(("click", Some(1L)), ("click", Some(2L)),
                 ("ghost", None), ("ghost", None))
      .toDF("event_type", "user_id")
    val segs = df.filter(col("user_id").isNotNull)
      .groupBy("event_type").agg(expr("bitmap_agg(user_id)").as("bm"))
      .select(col("event_type"), expr("bitmap_count(bm)").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(segs == Map("click" -> 2L), s"ghost segment must not appear: $segs")
  }

  test("rollup estimates track exact distincts; partial table is group-sized") {
    val e = Tables.events(spark, sf).withColumn("event_date", to_date(col("ts")))
    val keys = Seq("event_type")
    val partials = IncrementalRollup.partial(e, keys, "user_id")
    assert(partials.count() == e.select("event_type").distinct().count())

    val est = IncrementalRollup.merged(partials, keys)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = e.groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(est(k) - ex).toDouble / ex <= 0.05,
        s"$k: estimate ${est(k)} vs exact $ex")
    }
  }
}
