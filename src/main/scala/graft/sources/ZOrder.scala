package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data skipping for
  * parquet layouts.
  *
  * The reference's MergeTree gets skipping only on its ORDER BY prefix
  * (`(timestamp, event_name)`, migrations 002..011 line 18-20): a predicate on a
  * non-prefix column scans everything. Interleaving the bits of several
  * columns' quantile ranks gives every listed column partial locality, so
  * row-group min/max stats prune scans for predicates on ANY of them —
  * the standard lakehouse answer at 100 TB when one sort prefix can't
  * serve all query shapes.
  *
  * Scale shape: one `approxQuantile` pass computes per-column cut points
  * (driver-side literals, no shuffle), the z-value is a pure codegen'd
  * column expression, and `repartitionByRange` on it is the same single
  * shuffle a plain sorted write pays. Nothing here is driver-bound by
  * data size.
  */
object ZOrder {

  /** Per-column quantile bucket index in [0, 2^bits), as a codegen'd
    * expression over driver-collected cut points (count of cuts ≤ v).
    * NULLs land in bucket 0. */
  private def bucketCol(c: Column, cuts: Array[Double]): Column =
    cuts.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(c.cast("double") >= cut, 1).otherwise(0)
    }

  /** Quantile-rank bucket columns for `cols` — the shared first step of
    * both curves (one approxQuantile pass, cut points become literals). */
  private def bucketCols(df: DataFrame, cols: Seq[String], bits: Int): Seq[Column] = {
    require(cols.size >= 2 && cols.size <= 3, "curve clustering wants 2-3 columns")
    require(bits * cols.size <= 60, "curve value must fit a long")
    val nBuckets = 1 << bits
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // the multi-column overload computes every column's cut points in
    // ONE aggregate job — per-column calls would scan the table once per
    // column before the layout shuffle even starts
    val cuts = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    cols.zip(cuts).map { case (name, c) =>
      bucketCol(col(name), c).cast("long")
    }
  }

  /** Morton-interleave the bucket indices of `cols` (2 or 3 columns,
    * `bits` bits each) into one long. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    val buckets = bucketCols(df, cols, bits)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (b, j)) =>
        a.bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * cols.size + j))
      }
    }
  }

  /** Hilbert index over the same bucket grid — tighter per-file bounding
    * boxes than Morton (no power-of-two diagonal jumps) at the cost of a
    * few bit ops per row in the native [[graft.functions.HilbertIndex]]
    * expression. Prefer it when files-per-predicate-column matters most;
    * zvalue when pure expression simplicity does. */
  def hvalue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.HilbertIndex(
      Bridge.expression(array(bucketCols(df, cols, bits): _*)),
      Bridge.expression(lit(bits))))
  }

  /** Cluster `df` into `nPartitions` splits along the Z-curve of `cols`:
    * range-partition + sort by z-value, so consecutive output files cover
    * compact hyper-rectangles of the column space (tight row-group
    * min/max on every z-ordered column). */
  def cluster(df: DataFrame, cols: Seq[String], nPartitions: Int,
              bits: Int = 8): DataFrame =
    clusterBy(df, zvalue(df, cols, bits), nPartitions)

  /** Same layout discipline along the Hilbert curve. */
  def clusterHilbert(df: DataFrame, cols: Seq[String], nPartitions: Int,
                     bits: Int = 8): DataFrame =
    clusterBy(df, hvalue(df, cols, bits), nPartitions)

  private def clusterBy(df: DataFrame, curve: Column, nPartitions: Int): DataFrame =
    df.withColumn("_curve", curve)
      .repartitionByRange(nPartitions, col("_curve"))
      .sortWithinPartitions("_curve")
      .drop("_curve")
}
