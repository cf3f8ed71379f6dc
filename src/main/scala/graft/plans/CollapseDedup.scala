package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Deduplicate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: collapse nested Deduplicate nodes.
  *
  * `dropDuplicates(k).dropDuplicates(k ∪ more)` — a pattern that arises
  * when layered views each defensively dedup (the at-least-once event
  * tables make defensive dedup idiomatic here, SURVEY §1.4) — runs two
  * full shuffles in stock Spark. If the inner dedup's keys are a subset
  * of the outer's, the inner pass already makes those keys unique, so
  * rows are unique under any superset of columns: the outer node is a
  * no-op and one shuffle suffices.
  *
  * Registered via GraftExtensions (injectPostHocResolutionRule): it must
  * run on the analyzed plan — Spark's "Replace Operators" batch rewrites
  * Deduplicate into Aggregate before custom optimizer rules would see it.
  * (Rule[LogicalPlan] extension point from SURVEY §4.2/M4.)
  */
object CollapseDedup extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Deduplicate(outerKeys, inner @ Deduplicate(innerKeys, _))
        if innerKeys.map(_.exprId).toSet.subsetOf(outerKeys.map(_.exprId).toSet) =>
      // inner already guarantees per-innerKeys uniqueness ⇒ outer can't
      // remove anything when outerKeys ⊇ innerKeys
      inner
  }
}
