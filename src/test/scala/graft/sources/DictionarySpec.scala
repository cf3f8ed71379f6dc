package graft.sources

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CH external-dictionary analog: function-shaped O(1) lookups with no
  * join in the plan; loud load-time failures for every shape that would
  * otherwise corrupt lookups silently. */
class DictionarySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def dims = Seq(
    (1L, "alpha", 10L), (2L, "beta", 20L), (3L, "gamma", 30L))
    .toDF("id", "label", "weight")

  test("get/getOrDefault/has match the equivalent left join") {
    val dict = Dictionary.load(dims, "dims", "id", Seq("label", "weight"))
    val facts = Seq(1L, 2L, 3L, 4L, 99L).toDF("k")
    val got = facts.select(col("k"),
        dict.get("label", col("k")).as("label"),
        dict.get("weight", col("k")).as("weight"),
        dict.getOrDefault("label", col("k"), lit("?")).as("label_d"),
        dict.has(col("k")).as("present"))
      .orderBy("k").collect()
    val d = dims
    val viaJoin = facts.join(d, facts("k") === d("id"), "left")
      .select(col("k"), col("label"), col("weight"),
        coalesce(col("label"), lit("?")).as("label_d"),
        col("id").isNotNull.as("present"))
      .orderBy("k").collect()
    assert(got.toSeq == viaJoin.toSeq)
    assert(got.map(_.getBoolean(4)).toSeq == Seq(true, true, true, false, false))
  }

  test("the plan carries no join node and an INT key probes a BIGINT dict") {
    val dict = Dictionary.load(dims, "dims", "id", Seq("label"))
    val q = Seq(1, 4).toDF("ik") // IntegerType key vs LongType dict
      .select(col("ik"), dict.get("label", col("ik")).as("label"))
    assert(!q.queryExecution.executedPlan.toString.toLowerCase.contains("join"),
      s"dictGet must not plan a join:\n${q.queryExecution.executedPlan}")
    assert(q.orderBy("ik").collect().map(_.getAs[String]("label")).toSeq ==
      Seq("alpha", null))
  }

  test("a probe value that does not fit the key type is absent, not a false match") {
    import spark.implicits._
    // INT-keyed dictionary probed with BIGINTs: 2^32+5 would wrap to 5
    // under a narrowing cast (or abort the query under ANSI) — the
    // documented semantics require NULL-for-absent instead
    val intDims = Seq((5, "five"), (7, "seven")).toDF("id", "label")
    val dict = Dictionary.load(intDims, "int_dims", "id", Seq("label"))
    val q = Seq(5L, (1L << 32) + 5L).toDF("k")
      .select(col("k"), dict.get("label", col("k")).as("label"),
        dict.has(col("k")).as("present"))
      .orderBy("k").collect()
    assert(q(0).getAs[String]("label") == "five" && q(0).getAs[Boolean]("present"))
    assert(q(1).getAs[String]("label") == null,
      s"out-of-range probe matched: ${q(1)}")
    assert(!q(1).getAs[Boolean]("present"))
  }

  test("NULL key probes to NULL / default / false, never matches") {
    val dict = Dictionary.load(dims, "dims", "id", Seq("label"))
    val r = Seq(Some(2L), None).toDF("k")
      .select(dict.get("label", col("k")).as("g"),
        dict.getOrDefault("label", col("k"), lit("d")).as("gd"),
        dict.has(col("k")).as("h"))
      .orderBy(col("g").asc_nulls_last).collect()
    assert(r(0).getString(0) == "beta" && r(0).getString(1) == "beta" && r(0).getBoolean(2))
    assert(r(1).isNullAt(0) && r(1).getString(1) == "d" && !r(1).getBoolean(2))
  }

  test("NULL attribute values fall through to the default") {
    val withNull = Seq((1L, Some("x")), (2L, None)).toDF("id", "label")
    val dict = Dictionary.load(withNull, "n", "id", Seq("label"))
    val r = Seq(1L, 2L).toDF("k")
      .select(col("k"), dict.getOrDefault("label", col("k"), lit("d")).as("v"))
      .orderBy("k").collect()
    assert(r.map(_.getString(1)).toSeq == Seq("x", "d"))
    // but has() still sees the key
    assert(Seq(2L).toDF("k").select(dict.has(col("k"))).head().getBoolean(0))
  }

  test("duplicate keys, NULL keys, oversize, unknown attr all fail loudly") {
    val dup = intercept[IllegalArgumentException] {
      Dictionary.load(Seq((1L, "a"), (1L, "b")).toDF("id", "v"), "dup", "id", Seq("v"))
    }
    assert(dup.getMessage.contains("duplicate key"))
    val nul = intercept[IllegalArgumentException] {
      Dictionary.load(Seq(Some(1L), None).toDF("id").withColumn("v", lit("x")),
        "nul", "id", Seq("v"))
    }
    assert(nul.getMessage.contains("NULL key"))
    val big = intercept[IllegalArgumentException] {
      Dictionary.load(spark.range(100).select(col("id"), col("id").as("v")),
        "big", "id", Seq("v"), maxEntries = 10)
    }
    assert(big.getMessage.contains("maxEntries") && big.getMessage.contains("joinGet"))
    val dict = Dictionary.load(dims, "dims", "id", Seq("label"))
    val attr = intercept[IllegalArgumentException] { dict.get("nope", lit(1L)) }
    assert(attr.getMessage.contains("no attribute"))
  }

  test("joinGet (the beyond-dictionary-size path) agrees with get") {
    val dict = Dictionary.load(dims, "dims", "id", Seq("label", "weight"))
    val facts = Seq(1L, 3L, 42L).toDF("k")
    val viaDict = facts.select(col("k"),
        dict.get("label", col("k")).as("label"),
        dict.get("weight", col("k")).as("weight"))
      .orderBy("k").collect()
    val viaJoin = Dictionary.joinGet(facts, dims, col("k"), "id", Seq("label", "weight"))
      .orderBy("k").collect()
    assert(viaDict.toSeq == viaJoin.toSeq)
  }
}
