package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting isn't available (e.g. the skew is in a broadcast-ineligible
  * dimension, or the join feeds a stateful operator that pins
  * partitioning).
  *
  * The skewed (big) side gets a random salt in [0, parts); the other
  * side is replicated `parts` times with every salt value, and the join
  * key becomes (key, salt). One hot key is thereby spread over `parts`
  * shuffle partitions at the cost of replicating the small side — the
  * standard trade (see e.g. the skew-mitigation pattern in Spark's AQE
  * OptimizeSkewedJoin, which automates the same idea at runtime).
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `key`, salted `parts` ways.
    * Result equals `big.join(small, key)` row-for-row. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 parts: Int = 16): DataFrame = {
    require(parts > 0, "parts must be positive")
    val salted = big.withColumn("_salt", (rand(seed = 42) * parts).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(parts - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Skewed aggregation: two-phase count — partial by (key, salt), final
    * by key. Spark's partial aggregation already does this for algebraic
    * aggregates; the explicit form matters for non-algebraic ones
    * (e.g. collect_list of a hot key, distinct-heavy paths). */
  def saltedCount(df: DataFrame, key: String, parts: Int = 16): DataFrame = {
    val phase1 = df
      .withColumn("_salt", (rand(seed = 42) * parts).cast("int"))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
    phase1.groupBy(col(key)).agg(sum("_partial").as("n"))
  }

  /** Column helper: deterministic salt from a secondary column — keeps
    * co-located rows together (useful when downstream needs stable
    * placement rather than uniform spread). */
  def hashSalt(c: Column, parts: Int): Column = pmod(xxhash64(c), lit(parts))
}
