package graft.plans

import java.sql.Timestamp
import graft.{SparkEntry, TestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def ts(s: Long) = new Timestamp(1726300800000L + s * 1000)

  test("native as-of join == union-window composition on real data (O-J6)") {
    val native = SparkEntry.queries("o_j6b_asof_native")(spark, sf).collect()
    val composed = SparkEntry.queries("o_j6_asof")(spark, sf)
      .select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate").collect()
    assert(native.length == composed.length && native.length > 0)
    assert(native.map(_.toString).toSeq == composed.map(_.toString).toSeq)
  }

  test("plan: AsOfJoinExec with one exchange+sort per side, no window/union") {
    val p = SparkEntry.queries("o_j6b_asof_native")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"native exec missing in:\n$p")
    assert(!p.contains("Window"), s"window leaked into native plan:\n$p")
    assert(!p.contains("Union"), s"union leaked into native plan:\n$p")
  }

  test("semantics: ties inclusive, tie-break picks max, outer emits misses, nulls match nothing") {
    import spark.implicits._
    val left = Seq(
      ("e1", "u1", ts(10)),                       // matches r2 (t=10 inclusive, max tiebreak 12)
      ("e2", "u1", ts(5)),                        // matches r0 (t=0)
      ("e3", "u1", ts(-1)),                       // before all rights -> miss
      ("e4", "u2", ts(100)),                      // key with no right rows -> miss
      ("e5", null.asInstanceOf[String], ts(50)),  // null key -> miss
      ("e6", "u3", ts(7))                         // right has null-time row for u3; real row at t=3
    ).toDF("eid", "k", "t")
    val right = Seq(
      ("u1", 10L, Option(ts(0))),
      ("u1", 11L, Option(ts(10))),
      ("u1", 12L, Option(ts(10))),   // same time as 11: tie-break ascending, last wins
      ("u1", 13L, Option(ts(99))),
      ("u3", 30L, None),             // null time: never matches
      ("u3", 31L, Option(ts(3)))
    ).toDF("k2", "oid", "t2")
    val out = AsOfJoin.asof(left, right, Seq("k"), Seq("k2"), "t", "t2",
        tieBreak = Seq("oid"), leftOuter = true)
      .select(col("eid"), col("oid")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map("e1" -> 12L, "e2" -> 10L, "e3" -> -1L,
      "e4" -> -1L, "e5" -> -1L, "e6" -> 31L))

    // inner join drops the misses instead
    val inner = AsOfJoin.asof(left, right, Seq("k"), Seq("k2"), "t", "t2",
      tieBreak = Seq("oid")).select("eid").collect().map(_.getString(0)).toSet
    assert(inner == Set("e1", "e2", "e6"))
  }

  test("forward direction: first right at-or-after, ties pick first tie-break") {
    import spark.implicits._
    val left = Seq(
      ("e1", "u1", ts(5)),   // -> r11 (t=10, first of the t=10 tie)
      ("e2", "u1", ts(10)),  // inclusive: also r11
      ("e3", "u1", ts(100)), // after all rights -> miss
      ("e4", "u2", ts(0))    // no rights for key -> miss
    ).toDF("eid", "k", "t")
    val right = Seq(
      ("u1", 10L, Option(ts(0))),
      ("u1", 11L, Option(ts(10))),
      ("u1", 12L, Option(ts(10))),
      ("u3", 30L, None)
    ).toDF("k2", "oid", "t2")
    val out = AsOfJoin.asof(left, right, Seq("k"), Seq("k2"), "t", "t2",
        tieBreak = Seq("oid"), leftOuter = true, forward = true)
      .select(col("eid"), col("oid")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map("e1" -> 11L, "e2" -> 11L, "e3" -> -1L, "e4" -> -1L))
  }

  test("install is idempotent; time-type mismatch rejected") {
    import spark.implicits._
    AsOfJoin.install(spark); AsOfJoin.install(spark)
    assert(spark.experimental.extraStrategies.count(_ == GraftStrategies) == 1)
    val l = Seq(("a", ts(0))).toDF("k", "t")
    val r = Seq(("a", 1)).toDF("k2", "t2") // int, not timestamp
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, Seq("k"), Seq("k2"), "t", "t2")
    }
  }

  test("graft_asof SQL table function == DataFrame API, native exec in plan") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    val left = Seq(("u1", "e1", ts(5)), ("u1", "e2", ts(20)), ("u2", "e3", ts(5)))
      .toDF("k", "eid", "t")
    val right = Seq(("u1", 10L, ts(0)), ("u1", 11L, ts(10)), ("u2", 20L, ts(7)))
      .toDF("k2", "oid", "t2")
    left.createOrReplaceTempView("tvf_l")
    right.createOrReplaceTempView("tvf_r")
    val viaSql = spark.sql(
      "SELECT eid, oid FROM graft_asof('tvf_l', 'tvf_r', 'k', 'k2', 't', 't2')")
    assert(viaSql.queryExecution.executedPlan.toString.contains("AsOfJoin ["),
      "SQL surface must reach the native operator")
    val sqlRows = viaSql.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val apiRows = AsOfJoin.asof(left, right, Seq("k"), Seq("k2"), "t", "t2")
      .select(col("eid"), col("oid")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // backward: e3 (u2, t=5) has no u2 right at-or-before t=5 (only t=7) -> dropped
    assert(sqlRows == apiRows && sqlRows == Map("e1" -> 10L, "e2" -> 11L))
    // modes thread through: forward+outer
    val fwd = spark.sql("""SELECT eid, oid FROM graft_asof('tvf_l', 'tvf_r',
        'k', 'k2', 't', 't2', 'forward outer', 'oid')""").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(fwd == Map("e1" -> 11L, "e2" -> -1L, "e3" -> 20L))
    // non-literal argument is rejected with a clear error
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof('tvf_l', 'tvf_r', 'k', 'k2', 't', lower('T2'))")
        .collect()
    }
  }

  test("tvf plan is lazy: UnresolvedRelation children, resolved by the querying session") {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.Literal
    // The builder must NOT touch any session's catalog: in a multi-session
    // JVM, SparkSession.active at parse time can be a different session
    // than the one that runs the query.
    val plan = AsOfJoin.tvfBuilder(
      Seq("no_such_view_anywhere", "also_absent", "k", "k2", "t", "t2")
        .map(Literal(_)))
    val byName = plan.asInstanceOf[AsOfJoinByName]
    assert(byName.children.forall(_.isInstanceOf[UnresolvedRelation]))
    assert(!plan.resolved)
    // A sibling session with ONLY its own temp views runs the TVF fine.
    import java.sql.Timestamp
    val s2 = spark.newSession()
    graft.functions.GraftExtensions.register(s2)
    import s2.implicits._
    Seq(("u1", "e1", ts(5))).toDF("k", "eid", "t")
      .createOrReplaceTempView("tvf_s2_l")
    Seq(("u1", 7L, ts(0))).toDF("k2", "oid", "t2")
      .createOrReplaceTempView("tvf_s2_r")
    val rows = s2.sql(
      "SELECT eid, oid FROM graft_asof('tvf_s2_l', 'tvf_s2_r', 'k', 'k2', 't', 't2')")
      .collect()
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toSeq == Seq("e1" -> 7L))
    // and those views are invisible to the primary session
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof('tvf_s2_l', 'tvf_s2_r', 'k', 'k2', 't', 't2')")
        .collect()
    }
  }

  test("ambiguous column names fail resolution instead of binding arbitrarily") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    // a relation with two case-insensitive matches for 'k' — SQL
    // resolution would raise ambiguity; the name-based as-of node must too
    Seq(("u1", "u1", "e1", ts(5))).toDF("k", "K", "eid", "t")
      .createOrReplaceTempView("tvf_amb_l")
    Seq(("u1", 7L, ts(0))).toDF("k2", "oid", "t2")
      .createOrReplaceTempView("tvf_amb_r")
    val ex = intercept[Exception] {
      spark.sql(
        "SELECT eid, oid FROM graft_asof('tvf_amb_l', 'tvf_amb_r', 'k', 'k2', 't', 't2')")
        .collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + messages(t.getCause)
    assert(messages(ex).contains("ambiguous"), s"expected ambiguity error, got: $ex")
  }
}
