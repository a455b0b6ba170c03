package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native backward as-of join as a first-class operator: custom
  * `LogicalPlan` + `SparkStrategy` + physical `SparkPlan` (the (c) rung
  * of the extension ladder — SURVEY.md §4.2 named this the optional
  * whole-operator custom piece).
  *
  * Semantics (identical to [[graft.operators.AsOfJoin.backward]]): for
  * each left row, the latest right row of the same key group with
  * `rightTs <= leftTs`, ties on equal ts broken by the greatest `tie`.
  *
  * Physical shape: both children hash-clustered on the key and sorted
  * (key, ts[, tie]) — requirements declared to Catalyst, which inserts
  * the exchanges/sorts (and reuses existing ones). The join itself is a
  * single streaming merge per co-partition: O(n+m) per key timeline and
  * O(1) state (one buffered right row), versus the window rewrite that
  * materializes a unioned sort. At 100 TB the wins compound: no union
  * materialization, no window-function state, and each side's sort can
  * ride bucketing.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, rightTie: Expression)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, rightTie: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending)
      :+ SortOrder(rightTie, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val numRightFields = rOut.length
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsB = BindReferences.bindReference(leftTs, lOut)
    val rTsB = BindReferences.bindReference(rightTs, rOut)
    val tsOrdering = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val keyTypes = leftKeys.map(_.dataType)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      // codegen'd comparator over the projected key rows (janino-compiled
      // per task, cached by the codegen cache) — the hot per-row compare,
      // vs. the interpreted StructType ordering used previously
      val keyOrdering: Ordering[InternalRow] = org.apache.spark.sql.catalyst.expressions.RowOrdering.create(
        keyTypes.zipWithIndex.map { case (dt, i) =>
          SortOrder(org.apache.spark.sql.catalyst.expressions.BoundReference(i, dt, nullable = true), Ascending)
        },
        Seq.empty)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(numRightFields)

      // one-row lookahead over the right side
      var rHead: InternalRow = null
      var rHeadKey: InternalRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) { rHead = rIter.next(); rHeadKey = rKeyProj(rHead).copy() }
        else { rHead = null; rHeadKey = null }
      advanceRight()

      var lastMatch: InternalRow = null // latest right row for current key
      var currentKey: InternalRow = null

      lIter.map { l =>
        val lKey = lKeyProj(l)
        if (currentKey == null || keyOrdering.compare(lKey, currentKey) != 0) {
          currentKey = lKey.copy()
          lastMatch = null
          // drop right rows for keys before this one
          while (rHead != null && keyOrdering.compare(rHeadKey, currentKey) < 0)
            advanceRight()
        }
        val lTsVal = lTsB.eval(l)
        if (lTsVal != null) {
          // absorb all same-key right rows with ts <= left ts; sorted by
          // (ts, tie) so the last absorbed row is the as-of match
          var continue = rHead != null && keyOrdering.compare(rHeadKey, currentKey) == 0
          while (continue) {
            val rTsVal = rTsB.eval(rHead)
            if (rTsVal != null && tsOrdering.compare(rTsVal, lTsVal) <= 0) {
              lastMatch = rHead.copy()
              advanceRight()
              continue = rHead != null && keyOrdering.compare(rHeadKey, currentKey) == 0
            } else continue = false
          }
        }
        joined(l, if (lastMatch == null) nullRight else lastMatch)
        resultProj(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Public builder + strategy registration. */
object AsOfJoinNative {

  /** Register the planner strategy once per session (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** Backward as-of join of two DataFrames on `keys` by `ts`, right
    * ties broken by greatest `tie`. Right-side columns should be
    * pre-renamed to avoid output name collisions. */
  def backward(leftDf: DataFrame, rightDf: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String, rightTieCol: String): DataFrame = {
    val spark = leftDf.sparkSession
    ensureRegistered(spark)
    val l = ColumnBridge.analyzed(leftDf)
    // self-join safety: custom nodes don't get DeduplicateRelations, so
    // conflicting attribute ids (both sides reading the same source) are
    // re-aliased into fresh ids on the right
    val rRaw = ColumnBridge.analyzed(rightDf)
    val r =
      if (l.outputSet.intersect(rRaw.outputSet).isEmpty) rRaw
      else ColumnBridge.analyzed(
        rightDf.select(rightDf.columns.toIndexedSeq.map(c => col(c).as(c)): _*))
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column '$name' not found"))
    val plan = AsOfJoinPlan(l, r,
      keys.map(attr(l, _)), keys.map(attr(r, _)),
      attr(l, leftTsCol), attr(r, rightTsCol), attr(r, rightTieCol))
    ColumnBridge.ofRows(spark, plan)
  }
}
