package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** CH `PROJECTION` analog — a pre-aggregated copy of a table that queries
  * are routed to TRANSPARENTLY when it can answer them
  * (`ALTER TABLE … ADD PROJECTION (SELECT k, sum(x) … GROUP BY k)`;
  * [implied] CH 22.3 MergeTree feature, the query-time sibling of the
  * ingest-time rollups in `operators.IncrementalRollup`).
  *
  * Spark-native shape: [[Projection.materialize]] writes the rollup as
  * ordinary parquet (one shuffle, partial+final mergeable aggregates
  * only), and [[ProjectionRewrite]] — a `Rule[LogicalPlan]` on the
  * optimizer — rewrites a matching `Aggregate` over the BASE scan into
  * the same aggregate over the projection scan. At 100 TB this is the
  * difference between re-scanning the fact table and scanning a table
  * with one row per group: the rewrite fires before physical planning,
  * so filter pushdown and column pruning apply to the projection scan
  * like any other.
  *
  * A rewrite fires only when it is PROVABLY answer-preserving:
  * grouping keys ⊆ projection keys (re-aggregation merges the finer
  * partials), every aggregate re-expressible over partials
  * (sum→sum of sums, count→sum of counts — never-null via coalesce 0,
  * min/max→min/max of min/max, avg→sum/count when both partials exist),
  * filters reference projection keys only, no DISTINCT / FILTER clauses,
  * and the aggregate is grouped (a global aggregate over an empty base
  * has rows the projection lacks). Output names, exprIds, and types are
  * preserved so parent operators never notice the swap.
  */
final case class AggSpec(func: String, input: String)

final case class ProjectionDef(
    name: String,
    baseRoots: Set[String],
    path: String,
    groupCols: Seq[String],
    partials: Map[(String, String), String])

object Projection {
  def partialColumn(a: AggSpec): String =
    if (a.input == "*") s"${a.func}_all" else s"${a.func}_${a.input}"

  /** One-shot batch build of the rollup (refresh = re-run; for streaming
    * maintenance pair with `operators.IncrementalRollup`). Only
    * partial+final mergeable aggregates are allowed in — that is what
    * makes re-aggregation over the projection sound. */
  def materialize(base: DataFrame, name: String, groupCols: Seq[String],
                  specs: Seq[AggSpec], outPath: String): ProjectionDef = {
    require(groupCols.nonEmpty, "projection needs at least one group column")
    require(specs.nonEmpty, "projection needs at least one aggregate")
    val aggCols: Seq[Column] = specs.map { sp =>
      val cn = partialColumn(sp)
      sp match {
        case AggSpec("sum", c)     => sum(col(c)).as(cn)
        case AggSpec("min", c)     => min(col(c)).as(cn)
        case AggSpec("max", c)     => max(col(c)).as(cn)
        case AggSpec("count", "*") => count(lit(1)).as(cn)
        case AggSpec("count", c)   => count(col(c)).as(cn)
        case other => throw new IllegalArgumentException(
          s"projection aggregate must be sum/min/max/count, got: $other")
      }
    }
    base.groupBy(groupCols.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      .write.mode("overwrite").parquet(outPath)
    ProjectionDef(name, baseRootsOf(base), outPath, groupCols,
      specs.map(sp => (sp.func, sp.input) -> partialColumn(sp)).toMap)
  }

  /** Identity of "the base table" = the file-source root paths of its
    * scan — the same notion the rewrite matches on. */
  def baseRootsOf(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten.toSet

  /** Incremental maintenance — CH projections are maintained ON INSERT,
    * not by re-scanning the base. A DELTA of newly-ingested base rows is
    * aggregated to the same partials and MERGED group-wise with the
    * stored projection: sum/count partials add, min/max partials
    * min/max — mergeability is exactly what [[materialize]] restricted
    * the aggregate set for. Cost per batch: one shuffle of the delta's
    * partials plus a rewrite of the (one-row-per-group) projection —
    * never a base re-scan. The merged frame is eagerly checkpointed
    * before the overwrite so the self-read-overwrite hazard can't bite. */
  def merge(delta: DataFrame, pd: ProjectionDef): Unit = {
    val spark = delta.sparkSession
    val deltaAgg = {
      val aggCols = pd.partials.toSeq.sortBy(_._2).map { case ((f, in), cn) =>
        (f, in) match {
          case ("sum", c)     => sum(col(c)).as(cn)
          case ("min", c)     => min(col(c)).as(cn)
          case ("max", c)     => max(col(c)).as(cn)
          case ("count", "*") => count(lit(1)).as(cn)
          case ("count", c)   => count(col(c)).as(cn)
        }
      }
      delta.groupBy(pd.groupCols.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    }
    val mergeCols = pd.partials.toSeq.sortBy(_._2).map { case ((f, _), cn) =>
      f match {
        case "sum" | "count" => sum(col(cn)).as(cn)
        case "min"           => min(col(cn)).as(cn)
        case "max"           => max(col(cn)).as(cn)
      }
    }
    val merged = spark.read.parquet(pd.path)
      .unionByName(deltaAgg)
      .groupBy(pd.groupCols.map(col): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
      .localCheckpoint(true) // materialize BEFORE overwriting our own input
    merged.write.mode("overwrite").parquet(pd.path)
    merged.unpersist()
  }

  /** Streaming maintainer: tail the APPEND directory (where ingest lands
    * new base files — not the historical base, which [[materialize]]
    * already folded) and merge every micro-batch of new rows into the
    * projection via [[merge]] — the insert-time maintenance loop,
    * exactly-once per batch under the checkpoint. */
  def maintain(spark: SparkSession, deltaDir: String,
               schema: org.apache.spark.sql.types.StructType,
               pd: ProjectionDef, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(deltaDir)
      .writeStream
      .queryName(s"graft-projection-${pd.name}")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) merge(batch, pd)
      }
      .start()
}

object ProjectionRewrite extends Rule[LogicalPlan] {
  private final case class Registered(p: ProjectionDef, spark: SparkSession)
  private val registry = new ConcurrentHashMap[String, Registered]()

  /** Register + make the rule live on this session (idempotent; the
    * experimental hook works on already-built sessions, unlike
    * spark.sql.extensions). */
  def register(spark: SparkSession, p: ProjectionDef): Unit = {
    registry.put(p.name, Registered(p, spark))
    install(spark)
  }
  def deregister(name: String): Unit = registry.remove(name)
  def clear(): Unit = registry.clear()

  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq this)) spark.experimental.extraOptimizations = cur :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        unwrap(agg.child).flatMap { case (lr, filters) =>
          findFor(lr).flatMap(reg => tryRewrite(agg, filters, reg))
        }.getOrElse(agg)
    }
  }

  /** Base-scan pattern: the aggregate's child may wrap the relation in
    * aliases, key-only filters, and pruning projects (attribute-only —
    * anything computed in between defeats the match, correctly). */
  private def unwrap(plan: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
    plan match {
      case lr: LogicalRelation   => Some((lr, Nil))
      case SubqueryAlias(_, c)   => unwrap(c)
      case Filter(cond, c)       => unwrap(c).map { case (lr, fs) => (lr, cond +: fs) }
      case Project(list, c) if list.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(c)
      case _ => None
    }

  private def findFor(lr: LogicalRelation): Option[Registered] = {
    val roots = lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).toSet
      case _ => return None
    }
    registry.values.asScala.find(r => r.p.baseRoots.nonEmpty && r.p.baseRoots == roots)
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  private def tryRewrite(agg: Aggregate, filters: Seq[Expression],
                         reg: Registered): Option[LogicalPlan] = {
    val p = reg.p
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.isEmpty) return None // empty-base global agg differs
    if (!groupAttrs.forall(a => p.groupCols.contains(a.name))) return None
    if (!filters.forall(_.references.forall(r => p.groupCols.contains(r.name))))
      return None

    // fresh scan per rewrite: fresh exprIds, so two rewrites in one plan
    // can never collide
    val scan = reg.spark.read.parquet(p.path).queryExecution.analyzed
    val out: Map[String, Attribute] = scan.output.map(a => a.name -> a).toMap
    def partialAttr(func: String, input: String): Option[Attribute] =
      p.partials.get((func, input)).flatMap(out.get)

    def rewriteAggExpr(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      def asSum(pa: Attribute): Expression =
        ae.copy(aggregateFunction = Sum(pa), resultId = NamedExpression.newExprId)
      ae.aggregateFunction match {
        case f: Sum => attrName(f.child).flatMap(partialAttr("sum", _)).map(asSum)
        case f: Min => attrName(f.child).flatMap(partialAttr("min", _)).map(pa =>
          ae.copy(aggregateFunction = Min(pa), resultId = NamedExpression.newExprId))
        case f: Max => attrName(f.child).flatMap(partialAttr("max", _)).map(pa =>
          ae.copy(aggregateFunction = Max(pa), resultId = NamedExpression.newExprId))
        case f: Count => (f.children match {
          case Seq(Literal(_, _)) => partialAttr("count", "*")
          case Seq(a: AttributeReference) => partialAttr("count", a.name)
          case _ => None
        }).map(pa => Coalesce(Seq(asSum(pa), Literal(0L)))) // count is never null
        case f: Average if f.dataType == DoubleType =>
          for {
            s <- attrName(f.child).flatMap(partialAttr("sum", _))
            c <- attrName(f.child).flatMap(partialAttr("count", _))
          } yield Divide(Cast(asSum(s), DoubleType), Cast(asSum(c), DoubleType))
        case _ => None
      }
    }

    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => rewriteAggExpr(ae)
      case a: AttributeReference =>
        if (p.groupCols.contains(a.name)) out.get(a.name) else None
      case leaf if leaf.children.isEmpty && leaf.references.isEmpty => Some(leaf)
      case other =>
        val kids = other.children.map(rewriteExpr)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
    }

    // output names, exprIds, and types survive the swap — parents of the
    // aggregate keep resolving against the same attributes
    val newAes = agg.aggregateExpressions.map {
      case a: AttributeReference if p.groupCols.contains(a.name) =>
        out.get(a.name) match {
          case Some(pa) => Alias(pa, a.name)(exprId = a.exprId)
          case None => return None
        }
      case al: Alias => rewriteExpr(al.child) match {
        case Some(e) => Alias(e, al.name)(exprId = al.exprId)
        case None => return None
      }
      case _ => return None
    }
    val newGes: Seq[Expression] = groupAttrs.map(a => out(a.name))
    val newFilters = filters.map(_.transformUp {
      case a: AttributeReference => out(a.name)
    })
    val needed = (newAes.flatMap(_.references) ++ newFilters.flatMap(_.references))
      .map(_.exprId).toSet
    val pruned = Project(scan.output.filter(a => needed.contains(a.exprId)), scan)
    val child = newFilters.foldLeft[LogicalPlan](pruned)((pl, c) => Filter(c, pl))
    Some(agg.copy(groupingExpressions = newGes, aggregateExpressions = newAes,
      child = child))
  }
}
