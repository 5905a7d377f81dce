package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN — the canonical whole-operator extension Spark lacks
  * (DuckDB/kdb/Pandas `merge_asof` semantics): each left row matches
  * the LATEST right row with the same key whose timestamp is `<=` the
  * left timestamp, left-outer (null right side when no prior row).
  *
  * Spark can only express this as a windowed union or a range
  * theta-join; both blow up under Catalyst (the window serializes per
  * key, the theta-join is a nested loop producing |matches| rows to
  * re-aggregate). This is the brief's case (c): a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`.
  *
  * Scale shape: both sides declare `ClusteredDistribution(key)` and
  * `(key, ts)` child ordering — `EnsureRequirements` inserts the
  * hash exchanges and sorts (reusing existing ones when the data is
  * already bucketed), then each co-partition pair streams through ONE
  * forward-only merge scan: O(|L| + |R|) per partition, no buffering
  * beyond a single remembered right row, no row-count blowup.
  *
  * Null keys/timestamps never match (DuckDB ASOF semantics). Ties:
  * when several right rows share the matched (key, ts), `rightTie`
  * (when given) pins the pick — it joins the right child's required
  * sort order as a THIRD ascending key, and since the merge scan
  * remembers the LAST row not after the cursor, the MAX tie value
  * wins. This makes the batch face agree by construction with the
  * streaming twin's `max(struct(ts, id))` reduction
  * ([[graft.streaming.Events.asofLastTouchStream]]). Without a tie
  * column the sort's arbitrary tie order decides — callers must then
  * make (key, ts) unique per side.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    tolerance: Option[Long] = None,
    rightTie: Option[Expression] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule mapping the logical as-of join onto its exec node
  * (registered via `GraftExtensions.injectPlannerStrategy`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    tolerance: Option[Long] = None,
    rightTie: Option[Expression] = None) extends BinaryExecNode {

  /** Numeric view of a ts internal value for the tolerance check
    * (TimestampType evaluates to Long micros, DateType to Int days,
    * integral columns to themselves). */
  private def tsNum(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => throw new IllegalArgumentException(
      s"as-of tolerance requires an integral/timestamp ts, got $other")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)) ::
      (Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
        // tie column third in the sort: among equal (key, ts) rows the
        // merge scan remembers the LAST, so ascending order makes the
        // MAX tie value the deterministic winner
        rightTie.map(SortOrder(_, Ascending)).toSeq) :: Nil

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val nRight = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // forward-only merge: remember the last right row not after the
      // current left cursor, keyed; both inputs arrive (key, ts)-sorted
      var lastRight: InternalRow = null
      var lastRightKey: Any = null
      var lastRightTs: Any = null
      var pending: InternalRow = if (ri.hasNext) ri.next() else null

      li.map { lrow =>
        val lkv = lk.eval(lrow)
        val ltv = lt.eval(lrow)
        // null key or ts never matches (DuckDB ASOF semantics); nulls
        // sort first under Spark's ordering, so the cursor is not
        // advanced past live rows by skipping them here
        var advance = pending != null && lkv != null && ltv != null
        while (advance) {
          val rkv = rk.eval(pending)
          val rtv = rt.eval(pending)
          if (rkv == null || rtv == null) {
            pending = if (ri.hasNext) ri.next() else null
            advance = pending != null
          } else {
            val kc = keyOrd.compare(rkv, lkv)
            if (kc < 0 || (kc == 0 && tsOrd.compare(rtv, ltv) <= 0)) {
              // copy: the child iterator may reuse its row buffer; the
              // key is re-evaluated from the copy for the same reason
              // (a non-primitive key would point into the old buffer)
              lastRight = pending.copy()
              lastRightKey = rk.eval(lastRight)
              lastRightTs = rt.eval(lastRight)
              pending = if (ri.hasNext) ri.next() else null
              advance = pending != null
            } else advance = false
          }
        }
        val matched = lkv != null && ltv != null && lastRight != null &&
          keyOrd.compare(lastRightKey, lkv) == 0 &&
          tolerance.forall(tol => tsNum(ltv) - tsNum(lastRightTs) <= tol)
        proj(joined(lrow, if (matched) lastRight else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
