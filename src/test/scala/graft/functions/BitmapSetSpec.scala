package graft.functions

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[BitmapSet]] — exact mergeable id-set state (CH groupBitmap analog). */
class BitmapSetSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def build(xs: Seq[Long]): Array[Byte] = {
    val s = new BitmapSet.State
    xs.foreach(s.insert)
    BitmapSet.serialize(s)
  }

  test("serialization is insertion-order independent and merge is union") {
    val xs = Seq(5L, 1L, 9L, 5L, 1L, 42L)
    assert(build(xs).sameElements(build(xs.reverse)))
    // split + merge == single pass, byte-equal
    val a = BitmapSet.deserialize(build(Seq(1L, 2L, 3L)))
    a.mergeFrom(BitmapSet.deserialize(build(Seq(3L, 4L))))
    assert(BitmapSet.serialize(a).sameElements(build(Seq(1L, 2L, 3L, 4L))))
  }

  test("set algebra matches reference set operations") {
    val xs = (1L to 100L by 3).toSeq // {1,4,...,100}
    val ys = (1L to 100L by 5).toSeq // {1,6,...,96}
    val (a, b) = (build(xs), build(ys))
    val (sx, sy) = (xs.toSet, ys.toSet)
    assert(BitmapSet.cardinality(a) == sx.size)
    assert(BitmapSet.andCount(a, b) == (sx & sy).size)
    assert(BitmapSet.orCount(a, b) == (sx | sy).size)
    assert(BitmapSet.andnotCount(a, b) == (sx -- sy).size)
    // empty edge cases
    val e = build(Seq.empty)
    assert(BitmapSet.cardinality(e) == 0 && BitmapSet.andCount(a, e) == 0 &&
      BitmapSet.orCount(e, a) == sx.size && BitmapSet.andnotCount(e, a) == 0)
  }

  test("SQL surface: partial -> merge rollup equals direct aggregation") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, 0), (2L, 0), (2L, 1), (3L, 1), (1L, 1)).toDF("id", "b")
      .createOrReplaceTempView("bm_in")
    val direct = spark.sql(
      "SELECT bitmap_count(bitmap_agg(id)) AS n FROM bm_in").head().getLong(0)
    val rolled = spark.sql("""
      SELECT bitmap_count(bitmap_merge(pb)) AS n FROM (
        SELECT b, bitmap_agg(id) AS pb FROM bm_in GROUP BY b)""").head().getLong(0)
    assert(direct == 3L && rolled == 3L)
  }
}
