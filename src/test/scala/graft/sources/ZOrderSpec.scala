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

  test("hilbert index: bijection + unit-step adjacency in 2D and 3D") {
    import graft.functions.HilbertIndex
    import org.apache.spark.sql.catalyst.util.ArrayData
    def idx(coords: Seq[Long], bits: Int): Long =
      HilbertIndex.compute(ArrayData.toArrayData(coords.toArray), bits)
    // 2D, 4 bits: 256 cells. The curve must visit every cell exactly once
    // (bijection) and consecutive indices must be Manhattan-distance-1
    // neighbors — the defining Hilbert property Morton lacks.
    val cells2 = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val byIdx2 = cells2.map(c => idx(Seq(c._1, c._2), 4) -> c).sortBy(_._1)
    assert(byIdx2.map(_._1) == (0L until 256L))
    byIdx2.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1,
        s"non-adjacent step $a -> $b")
    }
    // 3D, 3 bits: 512 cells, same law.
    val cells3 = for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
      yield (x, y, z)
    val byIdx3 = cells3.map(c => idx(Seq(c._1, c._2, c._3), 3) -> c).sortBy(_._1)
    assert(byIdx3.map(_._1) == (0L until 512L))
    byIdx3.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2)
        + math.abs(a._3 - b._3) == 1, s"non-adjacent step $a -> $b")
    }
    // Morton (same grid) takes non-unit jumps — Hilbert's edge over it.
    def morton(x: Long, y: Long): Long =
      (0 until 4).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    val mSteps = cells2.map(c => morton(c._1, c._2) -> c).sortBy(_._1)
      .sliding(2).map { case Seq((_, a), (_, b)) =>
        math.abs(a._1 - b._1) + math.abs(a._2 - b._2) }.toSeq
    assert(mSteps.max > 1, "sanity: Morton does jump")
    // Degenerate inputs error instead of silently colliding: bits=0 maps
    // every row to 0 and out-of-range coords break bijectivity.
    intercept[IllegalArgumentException] { idx(Seq(1L, 1L), 0) }
    intercept[IllegalArgumentException] { idx(Seq(16L, 0L), 4) }
    intercept[IllegalArgumentException] { idx(Seq(-1L, 0L), 4) }
    intercept[IllegalArgumentException] { idx(Seq(1L, 1L), 32) } // 2*32 > 63
    // 1-D/63-bit boundary: 1L << 63 overflows — must still be accepted
    assert(idx(Seq(Long.MaxValue), 63) >= 0)
  }

  test("hilbert codegen == interpreted, SQL-registered, and file spans ≤ Morton's") {
    graft.functions.GraftExtensions.register(spark)
    // SQL path (codegen) agrees with direct compute on a 3D sample
    import org.apache.spark.sql.catalyst.util.ArrayData
    val got = spark.sql(
      "SELECT hilbert_index(array(3L, 9L, 14L), 4) AS h").head().getLong(0)
    assert(got == graft.functions.HilbertIndex.compute(
      ArrayData.toArrayData(Array(3L, 9L, 14L)), 4))
    // Layout quality: Hilbert clustering keeps both columns' per-file
    // spans tight, and the mean span over the clustered columns is no
    // worse than Morton's (unit-step curve ⇒ tighter bounding boxes).
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice", "l_quantity")
    val zed = ZOrder.cluster(li, Seq("l_orderkey", "l_extendedprice"), 16, bits = 4)
    val hil = ZOrder.clusterHilbert(li, Seq("l_orderkey", "l_extendedprice"), 16, bits = 4)
    val zSpan = meanSpan(zed, "l_orderkey") + meanSpan(zed, "l_extendedprice")
    val hSpan = meanSpan(hil, "l_orderkey") + meanSpan(hil, "l_extendedprice")
    assert(meanSpan(hil, "l_orderkey") < 0.5 && meanSpan(hil, "l_extendedprice") < 0.5)
    assert(hSpan <= zSpan * 1.1, s"hilbert $hSpan vs morton $zSpan")
    assert(hil.count() == li.count())
  }
}
