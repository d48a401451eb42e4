package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graft.Bridge

/** Native sorted-merge AS-OF join — the whole-operator Catalyst extension
  * (logical node → planner strategy → physical exec), for the one join
  * shape Spark genuinely lacks.
  *
  * Semantics (backward as-of, the ubiquitous form): for every left row,
  * attach the right row with EQUAL keys and the GREATEST right time
  * `<=` the left time; left rows with no such right row keep null right
  * columns (left-outer). This is `ASOF LEFT JOIN` in DuckDB/QuestDB,
  * `merge_asof` in pandas, the point-in-time join of every feature
  * store — and in stock Spark it must be emulated either with a window
  * over the UNIONED streams (q34's composition — two scans shaped into
  * one, carries every column of both sides through the sort) or a
  * range-bucketed join + per-left max (two shuffles of the big side
  * plus an aggregate).
  *
  * The physical plan here is the textbook one a native engine uses:
  *
  *   - both children hash-clustered on the join keys
  *     (`ClusteredDistribution`, same co-partitioning contract as
  *     SortMergeJoin — EnsureRequirements aligns partition counts),
  *   - both children sorted `(keys..., time)` ascending
  *     (`requiredChildOrdering` — Spark inserts the sorts, and an
  *     upstream layout that already satisfies them, e.g. a
  *     [[graft.operators.Layout.writeSorted]] lake table, skips them),
  *   - then ONE forward pass per co-partition pair
  *     (`zipPartitions`): advance the right iterator while its (key,
  *     time) is `<=` the left row's, remembering only the LAST right
  *     row per key — O(|L| + |R|) time, O(1) state beyond the two
  *     iterators, no buffering of equal-key groups, no per-row binary
  *     search, nothing driver-side.
  *
  * At 100 TB that is exactly two shuffles (one per side, the provable
  * minimum for a key-clustered join of two unsorted inputs) and memory
  * that never depends on key group size — a hot key with 10^9 events
  * streams through in constant space, so the operator needs no skew
  * mitigation beyond AQE's ordinary shuffle handling.
  *
  * Null pins (spec'd in AsOfJoinSpec): null in a LEFT key or time →
  * that row emits null right columns (SQL join semantics: null matches
  * nothing); right rows with null key or time are skipped — both
  * consistent with DuckDB ASOF (q162's oracle pins the full-engine
  * agreement).
  *
  * Registered via `SparkSessionExtensions.injectPlannerStrategy` in
  * GraftSession; the entry point is [[AsOfJoin.backward]].
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    forward: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one logical node, one physical translation. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // SortMergeJoin's contract: cluster both children on their keys;
  // EnsureRequirements co-partitions them (same numPartitions, same
  // hash function over corresponding expressions)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // (keys ascending, time ascending) both sides for backward as-of; the
  // FORWARD direction ("first right row at or after") is the same merge
  // run over time-DESCENDING runs with the time comparator negated —
  // keys still ascend, so the key walk is unchanged. Null rows (keys or
  // times) cluster at a deterministic end of each run (Ascending =
  // NULLS FIRST, Descending = NULLS LAST) and are skipped either way.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val timeDir = if (forward) Descending else Ascending
    Seq(leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, timeDir))
  }

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  // UI/diagnosability parity with the stock join execs: output cardinality
  // (= left cardinality, the as-of invariant) and how many rows matched —
  // a sudden match-rate drop is the operator's main production symptom
  // (clock skew, key drift) and should be readable off the SQL tab
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val natTimeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // backward consumes while rt <= lt over ascending runs; forward
      // consumes while rt >= lt over descending runs — one comparator
      // negation, the merge walk itself is direction-blind
      val timeCmp: (InternalRow, InternalRow) => Int =
        if (forward) (a, b) => -natTimeOrd.compare(a, b)
        else (a, b) => natTimeOrd.compare(a, b)
      // bind against the NULLABLE view of the right attributes: the
      // unmatched-row path feeds an all-null GenericInternalRow, and a
      // projection bound to the child's non-nullable originals would
      // skip the null checks in codegen and read 0s instead of nulls
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      // right-side lookahead; the projections reuse their buffers, so a
      // row held ACROSS iterations (the current best match) is copied
      var rNext: InternalRow = null
      var rNextKey: UnsafeRow = null
      var rNextTime: UnsafeRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rNext = rIter.next()
          rNextKey = rKeyProj(rNext)
          rNextTime = rTimeProj(rNext)
        } else { rNext = null; rNextKey = null; rNextTime = null }
      advanceRight()

      // last right row consumed with key == its stored key and a valid
      // time — the as-of candidate (O(1) state, the whole point)
      var cur: InternalRow = null
      var curKey: UnsafeRow = null

      lIter.map { lrow =>
        val lKey = lKeyProj(lrow)
        val lTime = lTimeProj(lrow)
        numOutputRows += 1
        if (lKey.anyNull || lTime.anyNull) {
          // null left key/time matches nothing; the right cursor is NOT
          // advanced, so no right row is missed regardless of where the
          // direction's null ordering placed this row in the run
          resultProj(joined(lrow, nullRight))
        } else {
          // drop right rows ordered strictly before this key (their key
          // can never appear again on the sorted left side)
          while (rNext != null && (rNextKey.anyNull ||
            keyOrd.compare(rNextKey, lKey) < 0)) advanceRight()
          // consume equal-key right rows with time <= left time (or a
          // null time, which can match nothing and must not block the
          // run), keeping the last valid one
          while (rNext != null && keyOrd.compare(rNextKey, lKey) == 0 &&
            (rNextTime.anyNull || timeCmp(rNextTime, lTime) <= 0)) {
            if (!rNextTime.anyNull) {
              cur = rNext.copy(); curKey = rNextKey.copy()
            }
            advanceRight()
          }
          val matched = cur != null && keyOrd.compare(curKey, lKey) == 0
          if (matched) numMatchedRows += 1
          resultProj(joined(lrow, if (matched) cur else nullRight))
        }
      }
    }
  }
}

/** User-facing entry point. */
object AsOfJoin {

  /** Backward as-of left join: each `left` row gains `right`'s columns
    * from the right row with equal `leftOn`/`rightOn` keys and the
    * greatest `rightTimeCol` `<=` `leftTimeCol` (null right columns when
    * no such row). Both time columns must share one orderable type.
    *
    * A match-window TOLERANCE (pandas merge_asof's `tolerance`) is a
    * caller-side post-filter, not an operator knob: the matched right
    * time is in the output, so `when(lt - rt <= tol, rcol)` re-nulls
    * too-old matches without touching the merge.
    *
    * The right side is re-aliased when the two plans share attribute
    * ids (self-source as-of — e.g. two filters of one table): Catalyst's
    * DeduplicateRelations only knows stock nodes, so the wrapper makes
    * the ids unique before building the custom node.
    */
  def backward(left: DataFrame, right: DataFrame,
               leftOn: Seq[String], rightOn: Seq[String],
               leftTimeCol: String, rightTimeCol: String): DataFrame =
    build(left, right, leftOn, rightOn, leftTimeCol, rightTimeCol, forward = false)

  /** Forward as-of left join: the EARLIEST right row with equal keys and
    * `rightTimeCol >= leftTimeCol` — "the next event at or after" (the
    * other direction feature stores and event-attribution pipelines
    * need; pandas merge_asof direction='forward').
    */
  def forward(left: DataFrame, right: DataFrame,
              leftOn: Seq[String], rightOn: Seq[String],
              leftTimeCol: String, rightTimeCol: String): DataFrame =
    build(left, right, leftOn, rightOn, leftTimeCol, rightTimeCol, forward = true)

  private def build(left: DataFrame, right: DataFrame,
                    leftOn: Seq[String], rightOn: Seq[String],
                    leftTimeCol: String, rightTimeCol: String,
                    forward: Boolean): DataFrame = {
    require(leftOn.nonEmpty && leftOn.size == rightOn.size,
      s"as-of join needs matching non-empty key lists: $leftOn vs $rightOn")
    val lPlan = left.queryExecution.analyzed
    val rightDeduped =
      if (lPlan.outputSet.intersect(right.queryExecution.analyzed.outputSet).isEmpty) right
      else right.select(right.columns.toIndexedSeq.map(n => right(n).as(n)): _*)
    val rPlan = rightDeduped.queryExecution.analyzed
    def attr(plan: LogicalPlan, n: String, side: String): Attribute =
      plan.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of join: no column '$n' on the $side side " +
          s"(has ${plan.output.map(_.name).mkString(", ")})"))
    val lt = attr(lPlan, leftTimeCol, "left")
    val rt = attr(rPlan, rightTimeCol, "right")
    require(lt.dataType == rt.dataType,
      s"as-of time columns must share a type: ${lt.dataType} vs ${rt.dataType}")
    val lk = leftOn.map(attr(lPlan, _, "left"))
    val rk = rightOn.map(attr(rPlan, _, "right"))
    // fail at CONSTRUCTION, not mid-job: the merge orders keys and times
    // with natural row ordering, which e.g. a map-typed column lacks
    (lk :+ lt).foreach(a => require(RowOrdering.isOrderable(a.dataType),
      s"as-of key/time column '${a.name}' has unorderable type ${a.dataType}"))
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"as-of key types must match: ${a.name}:${a.dataType} vs ${b.name}:${b.dataType}") }
    Bridge.ofRows(left.sparkSession, AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt, forward))
  }
}
