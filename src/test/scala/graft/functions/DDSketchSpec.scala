package graft.functions

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DDSketchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val alpha = 0.01

  test("quantile bins honor the DDSketch relative-error guarantee") {
    // deterministic pseudo-random positive values across 5 decades
    val xs = (1 to 20000).map(i => math.exp((i * 2654435761L % 100000) / 100000.0 * 11.5 - 2.0))
    val st = new DDSketch.State(alpha)
    xs.foreach(st.insert)
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.95, 0.99, 1.0)) {
      val exact = xs.sorted.apply(math.max(0, math.ceil(q * xs.size).toInt - 1))
      val est = DDSketch.binValue(
        DDSketch.quantileBin(st, q).asInstanceOf[Int], alpha)
      assert(math.abs(est - exact) / exact <= alpha + 1e-9,
        s"q=$q exact=$exact est=$est")
    }
  }

  test("merges are order-insensitive and byte-identical to a single pass") {
    val xs = (1 to 5000).map(i => (i * 37 % 9973) + 0.5)
    val whole = new DDSketch.State(alpha)
    xs.foreach(whole.insert)
    // three different batchings, merged in different orders
    def sketchOf(chunks: Seq[Seq[Double]], reversed: Boolean): Array[Byte] = {
      val parts = chunks.map { c =>
        val s = new DDSketch.State(alpha); c.foreach(s.insert); s
      }
      val acc = new DDSketch.State(Double.NaN)
      (if (reversed) parts.reverse else parts).foreach(acc.mergeFrom)
      DDSketch.serialize(acc)
    }
    val a = sketchOf(xs.grouped(613).toSeq, reversed = false)
    val b = sketchOf(xs.grouped(1217).toSeq, reversed = true)
    assert(a.sameElements(b))
    assert(a.sameElements(DDSketch.serialize(whole)))
  }

  test("underflow bucket and empty-sketch edge cases") {
    val s = new DDSketch.State(alpha)
    assert(DDSketch.quantileBin(s, 0.5) == null)
    Seq(-3.0, 0.0, 5.0).foreach(s.insert)
    assert(s.zero == 2 && s.total == 3)
    assert(DDSketch.quantileBin(s, 0.5) == Int.MinValue) // rank 2 of 3 in underflow
    assert(DDSketch.quantileBin(s, 1.0) == DDSketch.bin(5.0, DDSketch.gamma(alpha)))
  }

  test("SQL surface: partial+merge == single-pass sketch, quantile near exact") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = (1 to 10000).map(i => (i % 7, ((i * 131) % 9999) + 1.0))
      .toDF("g", "x")
    df.createOrReplaceTempView("dds_in")
    val twoLevel = spark.sql(
      """SELECT g, ddsketch_merge(qs) AS m FROM (
           SELECT g, pmod(x, 4) AS b, ddsketch_agg(x, 0.01D) AS qs
           FROM dds_in GROUP BY g, pmod(x, 4)
         ) GROUP BY g""")
    val onePass = spark.sql(
      "SELECT g, ddsketch_agg(x, 0.01D) AS m FROM dds_in GROUP BY g")
    val tl = twoLevel.collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    val op = onePass.collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(tl.keySet == op.keySet && tl.keySet.size == 7)
    tl.foreach { case (g, bytes) => assert(bytes.sameElements(op(g)), s"group $g") }
    // quantile estimate vs exact percentile, per group
    val est = spark.sql(
      """SELECT g, ddsketch_quantile(ddsketch_agg(x, 0.01D), 0.5D) AS k
         FROM dds_in GROUP BY g""").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val exact = spark.sql(
      "SELECT g, percentile(x, 0.5) AS p FROM dds_in GROUP BY g").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    est.foreach { case (g, k) =>
      val v = DDSketch.binValue(k, 0.01)
      assert(math.abs(v - exact(g)) / exact(g) <= 0.02, s"group $g: $v vs ${exact(g)}")
    }
  }
}
