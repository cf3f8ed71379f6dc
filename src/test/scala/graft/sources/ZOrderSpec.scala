package graft.sources

import graft.{Tables, TestSession}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  /** Mean per-partition normalized span of `c` — the fraction of the
    * column's global range a partition (≈ output file / row group) covers.
    * Small span = tight min/max stats = skippable. */
  private def meanSpan(df: DataFrame, c: String): Double = {
    val g = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val range = g.getDouble(1) - g.getDouble(0)
    val spans = df.groupBy(spark_partition_id().as("p"))
      .agg(((max(col(c)) - min(col(c))) / range).as("s"))
      .agg(avg("s")).head().getDouble(0)
    spans
  }

  test("z-order gives BOTH columns tight per-file ranges; plain sort only the prefix") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice", "l_quantity")
    val plain = li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
    val zed = ZOrder.cluster(li, Seq("l_orderkey", "l_extendedprice"), 16, bits = 4)

    // single-column sort: perfect on the prefix, useless on the other col
    assert(meanSpan(plain, "l_orderkey") < 0.15)
    assert(meanSpan(plain, "l_extendedprice") > 0.8)
    // z-order: partial locality on BOTH columns
    assert(meanSpan(zed, "l_orderkey") < 0.5)
    assert(meanSpan(zed, "l_extendedprice") < 0.5)
    // lossless: same rows
    assert(zed.count() == li.count())
    assert(zed.agg(sum("l_quantity")).head().getDouble(0)
      == li.agg(sum("l_quantity")).head().getDouble(0))
  }

  test("z-value interleaving is monotone per dimension on a fixed grid") {
    import spark.implicits._
    val grid = (for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toDouble, y.toDouble)).toDF("x", "y")
    val z = grid.withColumn("z", ZOrder.zvalue(grid, Seq("x", "y"), bits = 4))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    // fixing y, z is monotone in x (and vice versa). Non-strict: quantile
    // cut points on discrete duplicated values may merge adjacent buckets.
    for (y <- 0 until 16; x <- 1 until 16) {
      assert(z((x.toDouble, y.toDouble)) >= z((x - 1.0, y.toDouble)))
      assert(z((y.toDouble, x.toDouble)) >= z((y.toDouble, x - 1.0)))
    }
    // z stays in the bits*cols budget and resolves most cells
    assert(z.values.forall(v => v >= 0 && v < 256))
    assert(z.values.toSet.size >= 128, s"cells: ${z.values.toSet.size}")
  }
}
