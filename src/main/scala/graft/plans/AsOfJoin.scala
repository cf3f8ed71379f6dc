package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** ClickHouse `ASOF JOIN` (SURVEY O-J6; CH 22.3 feature the reference's
  * data model serves) as a first-class Spark operator: for every left row,
  * join the LAST right row with the same key and time at-or-before the
  * left time ("latest state as of this event").
  *
  * Spark has no native as-of join; the composable workaround (o_j6_asof)
  * unions both sides and runs `last(ignoreNulls)` over a window — one
  * union-wide shuffle + a full window sort over |L|+|R| rows. This
  * operator is the plan Spark WOULD pick natively: co-partition each side
  * by its key (one shuffle each), sort within partitions, then a single
  * streaming merge pass per partition — no window state, no union blowup.
  * At 100 TB the window trick's single-partition-per-key sort state is the
  * bottleneck; the merge pass is O(|L|+|R|) with O(1) state.
  *
  * The full extension-point stack (SURVEY §7 hard-part 3, build-plan (c)):
  * [[AsOfJoinPlan]] (LogicalPlan) → [[GraftStrategies]] (SparkStrategy,
  * via `SparkSessionExtensions.injectPlannerStrategy` or
  * `spark.experimental.extraStrategies`) → [[AsOfJoinExec]] (SparkPlan;
  * distribution/ordering requirements make EnsureRequirements insert the
  * exchanges and sorts, exactly as for SortMergeJoin).
  */
case class AsOfJoinPlan(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression],
    leftOuter: Boolean,
    forward: Boolean,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of join: requires both children clustered by their keys and
  * sorted by (keys, time[, tie-breaks]); a single forward merge pass per
  * partition keeps only the latest matching right row as running state. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression],
    leftOuter: Boolean,
    forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override lazy val metrics: Map[String, SQLMetric] =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +: rightTieBreak.map(SortOrder(_, Ascending))))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val (lOut, rOut) = (left.output, right.output)
    val (lKeys, rKeys, lTime, rTime) = (leftKeys, rightKeys, leftTime, rightTime)
    val outAttrs = output
    val isOuter = leftOuter
    val isForward = forward
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // Running state: the most recent right row consumed with a non-null
      // key and time. A candidate only counts for a left row if its key
      // still equals the left key at emission time.
      var lastMatch: InternalRow = null
      var lastKey: InternalRow = null
      lIter.flatMap { lrow =>
        val lkey = lKeyProj(lrow)
        if (lkey.anyNull) {
          // SQL join semantics: NULL keys match nothing.
          if (isOuter) { numOutputRows += 1; Iterator.single(resultProj(joined(lrow, nullRight))) }
          else Iterator.empty
        } else {
          val ltRow = lTimeProj(lrow).copy()
          val ltNull = ltRow.isNullAt(0)
          // Advance the right cursor over rows that can never match this
          // or a LATER left row: smaller keys, equal-key NULL-time rows
          // (they sort first and match nothing), and — direction-
          // dependent — equal-key rows at-or-before this left time
          // (backward keeps the latest as running state) or strictly
          // before it (forward discards them; the match is the head).
          // Both inputs are (key, time)-sorted, so the cursor moves
          // strictly forward — O(|L|+|R|) total.
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyProj(head)
            val c = keyOrd.compare(rk, lkey)
            val rtNull = rTimeProj(head).isNullAt(0)
            val consume = c < 0 || (c == 0 && rtNull) ||
              (c == 0 && !ltNull && {
                val cmp = timeOrd.compare(rTimeProj(head), ltRow)
                if (isForward) cmp < 0 else cmp <= 0
              })
            if (consume) {
              val r = rBuf.next()
              if (!isForward) {
                val rk2 = rKeyProj(r)
                if (!rk2.anyNull && !rTimeProj(r).isNullAt(0)) {
                  lastMatch = r.copy(); lastKey = rk2.copy()
                }
              }
            } else advance = false
          }
          val m: InternalRow =
            if (ltNull) null
            else if (isForward) {
              // match = first remaining equal-key row (its time is >= lt
              // by construction; nulls were consumed); NOT consumed — it
              // may also match later left rows.
              if (rBuf.hasNext && {
                    val rk = rKeyProj(rBuf.head)
                    !rk.anyNull && keyOrd.compare(rk, lkey) == 0
                  }) rBuf.head
              else null
            } else if (lastKey != null && keyOrd.compare(lastKey, lkey) == 0) lastMatch
            else null
          if (m != null) { numOutputRows += 1; Iterator.single(resultProj(joined(lrow, m))) }
          else if (isOuter) { numOutputRows += 1; Iterator.single(resultProj(joined(lrow, nullRight))) }
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Name-based as-of join, the lazy form produced by the SQL table function
  * [[AsOfJoin.tvfBuilder]]: children are `UnresolvedRelation`s and the
  * key/time columns are names, so the ANALYZING session's catalog resolves
  * the tables — not whichever session happened to be active when the query
  * text was parsed (multi-session JVMs share one active-session slot).
  * The node reports resolved once its children are and every referenced
  * column exists; [[GraftStrategies]] lowers it to [[AsOfJoinExec]] at
  * planning time, so no injected analyzer rule is needed and the runtime
  * [[graft.functions.GraftExtensions.register]] path works identically. */
case class AsOfJoinByName(
    leftKeys: Seq[String], rightKeys: Seq[String],
    leftTime: String, rightTime: String,
    tieBreak: Seq[String],
    leftOuter: Boolean,
    forward: Boolean,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {

  /** Resolve a name to exactly one child attribute. Ambiguity (a self-join
    * of one relation, or a child with duplicate column names) must fail
    * like SQL resolution would, not silently bind to whichever attribute
    * listed first. Thrown from `resolved` once children are resolved, so
    * the analyzer surfaces the message instead of a generic "unresolved
    * operator". */
  private[plans] def find(p: LogicalPlan, n: String): Option[Attribute] =
    p.output.filter(_.name.equalsIgnoreCase(n)) match {
      case Seq() => None
      case Seq(one) => Some(one)
      case many => throw new IllegalArgumentException(
        s"as_of_join: column name '$n' is ambiguous — matches " +
          s"${many.map(a => s"${a.name}#${a.exprId.id}").mkString(", ")}; " +
          "disambiguate with aliased projections before the join")
    }

  override lazy val resolved: Boolean = childrenResolved &&
    (leftKeys :+ leftTime).forall(find(left, _).isDefined) &&
    (rightKeys ++ (rightTime +: tieBreak)).forall(find(right, _).isDefined) &&
    find(left, leftTime).get.dataType == find(right, rightTime).get.dataType &&
    // key dtypes pairwise too: the exec compares keys with an ordering
    // built from the LEFT types — a 4-byte right key read by an 8-byte
    // accessor would mis-compare silently, so a mismatch must fail
    // analysis instead
    leftKeys.zip(rightKeys).forall { case (lk, rk) =>
      find(left, lk).get.dataType == find(right, rk).get.dataType
    }

  /** The key/time columns are strings, not Expressions, so the default
    * (expression-derived) references are empty — ColumnPruning would prune
    * them out of the children and un-resolve the plan. Surface them. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      (leftKeys :+ leftTime).flatMap(find(left, _)) ++
        (rightKeys ++ (rightTime +: tieBreak)).flatMap(find(right, _)))

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  /** Lower to the attribute-based plan (callable once resolved). */
  def toPlan: AsOfJoinPlan = AsOfJoinPlan(
    leftKeys.map(find(left, _).get), rightKeys.map(find(right, _).get),
    find(left, leftTime).get, find(right, rightTime).get,
    tieBreak.map(find(right, _).get), leftOuter, forward, left, right)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinByName =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for graft's custom logical operators. Installed
  * per-session by [[AsOfJoin.install]] (public `experimental` hook) or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lt, rt, tb, outer, fwd, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, outer, fwd, planLater(l), planLater(r)) :: Nil
    case j: AsOfJoinByName => apply(j.toPlan)
    case _ => Nil
  }
}

/** User-facing builder: `AsOfJoin.asof(events, orders, Seq("user_id"),
  * Seq("o_custkey"), "ts", "o_odts", tieBreak = Seq("o_orderkey"))`.
  * Backward (default): LAST right row with time <= left time; tie-break
  * columns resolve equal-time matches (last in ascending tie-break order
  * wins). `forward = true`: FIRST right row with time >= left time
  * (first in tie-break order) — CH ASOF's >= variant. CH picks one
  * arbitrary row on ties; we pin it for determinism. Caller must ensure
  * left/right have disjoint lineage (alias/re-select when self-joining). */
object AsOfJoin {
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftStrategies))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies

  def asof(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           tieBreak: Seq[String] = Nil,
           leftOuter: Boolean = false,
           forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val (lp, rp) = (left.queryExecution.analyzed, right.queryExecution.analyzed)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    require(attr(lp, leftTime).dataType == attr(rp, rightTime).dataType,
      "as-of time columns must share a data type (cast first)")
    // key dtypes must match pairwise too: the exec's key ordering is
    // built from the LEFT key types, and reading a 4-byte right key with
    // an 8-byte accessor would silently mis-compare instead of erroring
    leftKeys.zip(rightKeys).foreach { case (lk, rk) =>
      require(attr(lp, lk).dataType == attr(rp, rk).dataType,
        s"as-of key columns $lk/$rk must share a data type " +
          s"(${attr(lp, lk).dataType} vs ${attr(rp, rk).dataType} — cast first)")
    }
    org.apache.spark.sql.graft.Bridge.ofRows(spark, AsOfJoinPlan(
      leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
      attr(lp, leftTime), attr(rp, rightTime), tieBreak.map(attr(rp, _)),
      leftOuter, forward, lp, rp))
  }

  /** SQL table-function surface (the ClickHouse-user entry point —
    * `ASOF JOIN` as a FROM-clause relation):
    *
    *   SELECT ... FROM graft_asof(
    *     'left_table', 'right_table',
    *     'lk1,lk2', 'rk1,rk2',         -- equi-key columns per side
    *     'left_time', 'right_time'
    *     [, 'mode'                     -- '', 'outer', 'forward', both
    *     [, 'tie1,tie2']])             -- right-side tie-break columns
    *
    * All arguments are string literals. The returned plan is LAZY: tables
    * become `UnresolvedRelation`s inside an [[AsOfJoinByName]], so the
    * session that ANALYZES the query resolves them against its own
    * catalog/temp views — safe in multi-session JVMs where
    * `SparkSession.active` at parse time may differ from the querying
    * session. Register via [[graft.functions.GraftExtensions]]. */
  def tvfBuilder(args: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
    import org.apache.spark.sql.types.StringType
    def str(i: Int, what: String): String = args(i) match {
      case Literal(s, StringType) if s != null => s.toString
      case _ => throw new IllegalArgumentException(
        s"graft_asof: argument $i ($what) must be a string literal")
    }
    require(args.length >= 6 && args.length <= 8,
      "graft_asof(left, right, left_keys, right_keys, left_time, right_time[, mode[, tiebreak]])")
    def rel(i: Int, what: String) =
      UnresolvedRelation(CatalystSqlParser.parseMultipartIdentifier(str(i, what)))
    def keys(i: Int) = str(i, "keys").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val mode = if (args.length >= 7) str(6, "mode") else ""
    val tie = if (args.length >= 8) keys(7) else Nil
    AsOfJoinByName(keys(2), keys(3), str(4, "left time"), str(5, "right time"),
      tie, leftOuter = mode.contains("outer"), forward = mode.contains("forward"),
      rel(0, "left table"), rel(1, "right table"))
  }
}
