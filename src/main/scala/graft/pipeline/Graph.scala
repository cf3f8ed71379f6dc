package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the graph
  * core shared by the dedup-family queries (minhash clusters over
  * `documents`, semantic clusters over `embeddings`).
  *
  * Input: a SYMMETRIZED edge list `(src, dst)` (callers explode each
  * undirected pair into both directions — explode, not self-union, so the
  * upstream pair plan is evaluated once). The caller persists it; it feeds
  * every iteration.
  *
  * Scale shape: each round is one join keyed on the edge endpoint + one
  * min-aggregate — all shuffles keyed on vertex id, state is one label per
  * vertex, and the round count is bounded by the largest component's
  * DIAMETER (near-dup clusters are shallow: dupes of a common ancestor).
  * Convergence is detected by a label-sum signature — monotone
  * non-increasing, fixed point iff no label changed. Labels never ride the
  * driver; the signature is the only scalar collected per round.
  */
private[graft] object Graph {

  /** Returns (labels, persisted-intermediates): `labels` has one row per
    * vertex that appears in `edges` — (id, lbl) where lbl = min vertex id
    * of the component. Callers release the intermediates after the
    * terminal action via [[Materialize.drop]].
    *
    * Two hard-won loop rules:
    *  - every round is lineage-CUT with an eager localCheckpoint, not
    *    persist: Catalyst re-analyzes the full logical tree on each
    *    iteration, so an uncut loop accretes a plan whose ANALYSIS cost
    *    (driver, single-threaded) grows superlinearly with rounds —
    *    measured minutes of driver spin at 20+ rounds while executors
    *    idled. With the cut, each round re-plans a constant-depth tree.
    *  - each round does edge-relaxation PLUS path-halving
    *    (lbl := lbl(lbl(id)), the pointer-jumping step of hash-to-min —
    *    Rastogi et al., "Finding connected components in MapReduce", ICDE
    *    2013): labels are vertex ids, so a self-join hops to the label's
    *    label. Rounds drop from O(diameter) to O(log diameter) — the
    *    difference between 6 and 60 rounds on a stringy giant component,
    *    and the reason a threshold graph (which often HAS one) stays
    *    cheap. */
  def minLabelComponents(edges: DataFrame): (DataFrame, Seq[DataFrame]) = {
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint(true)
    // coalesce: a clean corpus has no pairs, so labels is empty and a
    // bare sum returns NULL — converge immediately to an empty result
    // instead of an NPE.
    var sig = labels.agg(coalesce(sum("lbl"), lit(0L))).first().getLong(0)
    var converged = false
    while (!converged) {
      // relax WITHOUT a union: min neighbor label per vertex, then
      // least() against the vertex's own label. (The natural
      // union-then-min formulation trips Catalyst's Union constraint
      // rewrite — NoSuchElementException in rewriteConstraints — when
      // both branches descend from the same `labels` plan.) Eagerly cut
      // so the halving self-join reads blocks instead of re-evaluating
      // the relaxation join.
      val viaEdges = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min("lbl").as("elbl"))
      val relaxed = labels.join(viaEdges, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("elbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      val next = relaxed.as("a")
        .join(relaxed.as("b"), col("a.lbl") === col("b.id"), "left")
        .groupBy(col("a.id").as("id"))
        .agg(min(coalesce(col("b.lbl"), col("a.lbl"))).as("lbl"))
        .localCheckpoint(true)
      val nextSig = next.agg(coalesce(sum("lbl"), lit(0L))).first().getLong(0)
      labels = next
      converged = nextSig == sig
      sig = nextSig
    }
    // localCheckpoint blocks are ContextCleaner-managed (released when the
    // RDD is GC'd); nothing for the caller to unpersist.
    (labels, Seq.empty)
  }

  /** Symmetrize an undirected pair list (a, b) into the (src, dst) edge
    * list [[minLabelComponents]] consumes — via explode so the pair plan
    * underneath is evaluated once (a self-union would run it per branch;
    * measured 2x the pair cost at sf0.1). */
  def symmetrize(pairs: DataFrame, a: String, b: String): DataFrame =
    pairs.select(explode(array(
        struct(col(a).as("src"), col(b).as("dst")),
        struct(col(b).as("src"), col(a).as("dst")))).as("e"))
      .select("e.src", "e.dst")
}
