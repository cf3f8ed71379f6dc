package graft.pipeline

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Greedy capacity-reset sequence packing: invariants + determinism. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // n_chars = 4 * tokens, so token budget is exact in the test
  private def docsOf(tokens: Seq[Long]) =
    tokens.zipWithIndex.map { case (t, i) => (i.toLong, t * 4) }
      .toDF("doc_id", "n_chars")

  test("single bucket replays the greedy fold exactly") {
    // capacity 10: [4,4] fill 8 | +3 overflows -> seq 1: [3,7] | [12] alone | [1]
    val df = docsOf(Seq(4, 4, 3, 7, 12, 1))
    val got = Packing.packSequences(df, capacity = 10, buckets = 1)
      .orderBy("doc_id")
      .select("doc_id", "seq_no", "seq_fill").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (0L, 0L, 4L), (1L, 0L, 8L), (2L, 1L, 3L), (3L, 1L, 10L),
      (4L, 2L, 12L), // oversize doc: its own sequence, fill > capacity
      (5L, 3L, 1L)))
  }

  test("zero-token doc followed by an oversize doc splits like the oracle fold") {
    // the recursion p.seq_fill + o.t > capacity has no fill>0 guard: a
    // 0-token doc leaves fill 0, and the oversize doc after it must
    // still open ITS OWN sequence (an earlier guard kept it in seq 0,
    // diverging from the pinned DuckDB recursive-CTE oracle)
    val df = docsOf(Seq(0, 12, 1))
    val got = Packing.packSequences(df, capacity = 10, buckets = 1)
      .orderBy("doc_id")
      .select("doc_id", "seq_no", "seq_fill").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 0L, 0L), (1L, 1L, 12L), (2L, 2L, 1L)))
  }

  test("every doc packed exactly once; no multi-doc sequence exceeds capacity") {
    val df = docsOf((1 to 500).map(i => (i * 37 % 90 + 1).toLong))
    val packed = Packing.packSequences(df, capacity = 128, buckets = 8).cache()
    assert(packed.count() == 500)
    assert(packed.select("doc_id").distinct().count() == 500)
    val over = packed.groupBy("bucket", "seq_no")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("n"))
      .filter(col("tot") > 128 && col("n") > 1)
    assert(over.count() == 0, "only singleton sequences may exceed capacity")
    packed.unpersist()
  }

  test("buckets pack independently and deterministically across reruns") {
    val df = docsOf((1 to 300).map(i => (i % 60 + 1).toLong))
    val a = Packing.packSequences(df, 256, 4).orderBy("doc_id").collect()
    val b = Packing.packSequences(df.repartition(13), 256, 4)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq, "input partitioning must not change the packing")
    // bucket assignment is doc_id % buckets
    assert(a.forall(r => r.getLong(1) == r.getLong(0) % 4))
  }

  test("sequences are contiguous runs in doc_id order within a bucket") {
    val df = docsOf((1 to 100).map(i => (i % 30 + 5).toLong))
    val packed = Packing.packSequences(df, 64, 2)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("bucket").orderBy("doc_id")
    val nonMono = packed
      .withColumn("prev_seq", lag("seq_no", 1).over(w))
      .filter(col("prev_seq").isNotNull &&
        (col("seq_no") < col("prev_seq") || col("seq_no") > col("prev_seq") + 1))
    assert(nonMono.count() == 0, "seq_no must advance by 0 or 1 in doc order")
  }
}
