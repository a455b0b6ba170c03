package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, GenerateUnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
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
    leftTs: Expression, rightTs: Expression, rightTie: Expression,
    broadcastRight: Boolean = false)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {

  /** Opt-in stats-based physical selection (the JoinSelection pattern):
    * when enabled and the right side's estimated size is under
    * `spark.sql.autoBroadcastJoinThreshold`, plan the broadcast exec
    * even without an explicit hint. Off by default so the plan shape is
    * deterministic for plan-guarded queries; the explicit
    * `broadcastRight` hint always wins. */
  val AutoBroadcastKey = "spark.graft.asof.autoBroadcast"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tie, bcast) =>
      val conf = org.apache.spark.sql.internal.SQLConf.get
      val auto = conf.getConfString(AutoBroadcastKey, "false").toBoolean &&
        conf.autoBroadcastJoinThreshold > 0 &&
        r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= conf.autoBroadcastJoinThreshold
      if (bcast || auto)
        AsOfJoinBroadcastExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
      else AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, rightTie: Expression)
    extends BinaryExecNode with CodegenSupport {

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
            if (rTsVal == null) {
              // a null ts can never satisfy rightTs <= leftTs: skip the
              // row (sorted NULLS FIRST, they cluster at the group head)
              // rather than blocking the rest of the key group behind it
              advanceRight()
              continue = rHead != null && keyOrdering.compare(rHeadKey, currentKey) == 0
            } else if (tsOrdering.compare(rTsVal, lTsVal) <= 0) {
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

  // ---------------------------------------------------------------------
  // Whole-stage codegen (VERDICT r2 item 2). Same two-iterator produce
  // pattern as SortMergeJoinExec: this node is the stage's produce root,
  // both children are consumed as iterators (inputRDDs), and the entire
  // merge state machine — key equality, right-side absorption, ts
  // comparison — is generated Java fused with the parent's consume code.
  // The interpreted doExecute above is retained as the automatic fallback
  // when janino compilation fails.
  // ---------------------------------------------------------------------

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // output rows go through a reused JoinedRow — parents that buffer must copy
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];")
    val rHead = ctx.addMutableState("InternalRow", "asofRHead")
    val rHeadKey = ctx.addMutableState("UnsafeRow", "asofRHeadKey")
    val matched = ctx.addMutableState("InternalRow", "asofMatched")
    val currentKey = ctx.addMutableState("UnsafeRow", "asofCurrentKey")
    val rStarted = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofRStarted")
    val joinedRow = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.expressions.JoinedRow", "asofJoinedRow",
      v => s"$v = new org.apache.spark.sql.catalyst.expressions.JoinedRow();")
    val nullRight = ctx.addMutableState("InternalRow", "asofNullRight",
      v => s"$v = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(${right.output.length});")

    // generated UnsafeRow comparator over the projected key rows:
    // null-first per column (matching SortOrder Ascending semantics in
    // the interpreted path), then ctx.genComp on the column type
    val keyTypes = leftKeys.map(_.dataType)
    val compareKeys = ctx.addNewFunction("asofCompareKeys",
      s"""
         |private int asofCompareKeys(UnsafeRow a, UnsafeRow b) {
         |  int comp = 0;
         |  ${keyTypes.zipWithIndex.map { case (dt, i) =>
              val av = CodeGenerator.getValue("a", dt, i.toString)
              val bv = CodeGenerator.getValue("b", dt, i.toString)
              s"""
                 |{
                 |  boolean anull = a.isNullAt($i);
                 |  boolean bnull = b.isNullAt($i);
                 |  if (anull != bnull) return anull ? -1 : 1;
                 |  if (!anull) {
                 |    comp = ${ctx.genComp(dt, av, bv)};
                 |    if (comp != 0) return comp;
                 |  }
                 |}
               """.stripMargin
            }.mkString("\n")}
         |  return comp;
         |}
       """.stripMargin)

    // right-side lookahead: decode the key of the buffered head row once
    ctx.INPUT_ROW = rHead
    ctx.currentVars = null
    val rightKeyEv = GenerateUnsafeProjection.createCode(ctx,
      BindReferences.bindReferences(rightKeys, right.output))
    val advanceRight = ctx.addNewFunction("asofAdvanceRight",
      s"""
         |private void asofAdvanceRight() {
         |  if ($rightInput.hasNext()) {
         |    $rHead = (InternalRow) $rightInput.next();
         |    ${rightKeyEv.code}
         |    $rHeadKey = (UnsafeRow) ${rightKeyEv.value}.copy();
         |  } else {
         |    $rHead = null;
         |    $rHeadKey = null;
         |  }
         |}
       """.stripMargin)

    // right ts, evaluated against the buffered head row
    ctx.INPUT_ROW = rHead
    ctx.currentVars = null
    val rTsEv = BindReferences.bindReference(rightTs, right.output).genCode(ctx)

    // left-row-scoped code
    val leftRow = ctx.freshName("asofLeftRow")
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftKeyEv = GenerateUnsafeProjection.createCode(ctx,
      BindReferences.bindReferences(leftKeys, left.output))
    val lTsEv = BindReferences.bindReference(leftTs, left.output).genCode(ctx)

    val tsComp = ctx.genComp(leftTs.dataType, rTsEv.value.toString, lTsEv.value.toString)

    // typed output vars read from the joined row: consume with COLUMN
    // vars, not the row itself — when this operator tops the codegen
    // stage, the framework then builds the UnsafeRow (a raw JoinedRow
    // would escape the stage and break collect())
    ctx.INPUT_ROW = joinedRow
    ctx.currentVars = null
    val resultVars = output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }

    s"""
       |if (!$rStarted) {
       |  $rStarted = true;
       |  $advanceRight();
       |}
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${leftKeyEv.code}
       |  if ($currentKey == null || $compareKeys((UnsafeRow) ${leftKeyEv.value}, $currentKey) != 0) {
       |    $currentKey = (UnsafeRow) ${leftKeyEv.value}.copy();
       |    $matched = null;
       |    while ($rHead != null && $compareKeys($rHeadKey, $currentKey) < 0) {
       |      $advanceRight();
       |    }
       |  }
       |  ${lTsEv.code}
       |  if (!${lTsEv.isNull}) {
       |    // absorb same-key right rows with ts <= left ts; input sorted
       |    // by (ts, tie), so the last absorbed row is the as-of match.
       |    // Null right ts (NULLS FIRST, clustered at the group head) is
       |    // skipped, never a blocker
       |    while ($rHead != null && $compareKeys($rHeadKey, $currentKey) == 0) {
       |      ${rTsEv.code}
       |      if (${rTsEv.isNull}) {
       |        $advanceRight();
       |      } else if ($tsComp <= 0) {
       |        $matched = $rHead.copy();
       |        $advanceRight();
       |      } else {
       |        break;
       |      }
       |    }
       |  }
       |  $joinedRow.apply($leftRow, $matched == null ? $nullRight : $matched);
       |  ${evaluateVariables(resultVars)}
       |  ${consume(ctx, resultVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Task-side index over the broadcast right relation: key → (ts, tie)-
  * sorted timeline, built lazily once per task (each task deserializes
  * its own copy, so the lazy vals are task-local). Shared by the
  * interpreted and generated paths of [[AsOfJoinBroadcastExec]].
  * Null-ts rows can never satisfy `ts <= leftTs` and are dropped at
  * build time. */
final class AsOfBroadcastIndex(
    bc: org.apache.spark.broadcast.Broadcast[Array[InternalRow]],
    rightKeys: Seq[Expression], rightOutput: Seq[Attribute],
    rightTs: Expression, rightTie: Expression,
    tsType: org.apache.spark.sql.types.DataType) extends Serializable {

  @transient private lazy val tsOrd = TypeUtils.getInterpretedOrdering(tsType)

  @transient private lazy val index: java.util.HashMap[InternalRow, Array[(Any, InternalRow)]] = {
    val rKeyProj = UnsafeProjection.create(rightKeys, rightOutput)
    val rTsB = BindReferences.bindReference(rightTs, rightOutput)
    val tieB = BindReferences.bindReference(rightTie, rightOutput)
    val tieOrd = TypeUtils.getInterpretedOrdering(rightTie.dataType)
    val grouped = new java.util.HashMap[InternalRow, scala.collection.mutable.ArrayBuffer[(Any, Any, InternalRow)]]()
    bc.value.foreach { r =>
      val ts = rTsB.eval(r)
      if (ts != null) {
        val k = rKeyProj(r).copy()
        var buf = grouped.get(k)
        if (buf == null) {
          buf = scala.collection.mutable.ArrayBuffer.empty[(Any, Any, InternalRow)]
          grouped.put(k, buf)
        }
        buf += ((ts, tieB.eval(r), r))
      }
    }
    val ord = new Ordering[(Any, Any, InternalRow)] {
      def compare(a: (Any, Any, InternalRow), b: (Any, Any, InternalRow)): Int = {
        val c = tsOrd.compare(a._1, b._1)
        if (c != 0) c else tieOrd.compare(a._2, b._2)
      }
    }
    val out = new java.util.HashMap[InternalRow, Array[(Any, InternalRow)]]()
    grouped.forEach((k, buf) =>
      out.put(k, buf.sorted(ord).map(t => (t._1, t._3)).toArray))
    out
  }

  /** Latest right row of `key`'s timeline with ts ≤ `lTs`, else null
    * (ties already resolved by the (ts, tie) build sort). */
  def lookup(key: InternalRow, lTs: Any): InternalRow = {
    val buf = index.get(key)
    if (buf == null) return null
    var lo = 0
    var hi = buf.length - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (tsOrd.compare(buf(mid)._1, lTs) <= 0) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans >= 0) buf(ans)._2 else null
  }
}

/** Broadcast backward as-of join: the dimension-lookup shape. When the
  * right side is small (an SCD history, a rates table), the merge exec
  * still forces a full shuffle + sort of the LEFT side to co-partition
  * it — at 100 TB that is a shuffle of the entire fact table for a
  * lookup. This variant broadcasts the right side instead and performs
  * a per-row hash lookup + binary search over the key's (ts, tie)-sorted
  * timeline: ZERO exchange and ZERO sort on the fact side, identical
  * semantics (latest rightTs ≤ leftTs, greatest tie on equal ts, null
  * right ts unmatchable). Whole-stage codegen generates the probe loop
  * (the BroadcastHashJoin pattern — broadcast prepared at codegen time,
  * the per-row path fused with the parent's consume); the interpreted
  * doExecute is the janino-failure fallback.
  */
final case class AsOfJoinBroadcastExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, rightTie: Expression)
    extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  private def buildIndex(): AsOfBroadcastIndex =
    new AsOfBroadcastIndex(right.executeBroadcast[Array[InternalRow]](),
      rightKeys, right.output, rightTs, rightTie, leftTs.dataType)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val numRightFields = right.output.length
    val helper = buildIndex()
    val lKeyExprs = leftKeys
    val lTsExpr = leftTs
    val outAttrs = output

    left.execute().mapPartitions { lIter =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val lTsB = BindReferences.bindReference(lTsExpr, lOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(numRightFields)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      lIter.map { l =>
        val lTsVal = lTsB.eval(l)
        val m = if (lTsVal == null) null else helper.lookup(lKeyProj(l), lTsVal)
        joined(l, if (m == null) nullRight else m)
        resultProj(joined)
      }
    }
  }

  // ---- whole-stage codegen: single streamed input, broadcast probe

  override def inputRDDs(): Seq[RDD[InternalRow]] = left.execute() :: Nil

  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val input = ctx.addMutableState("scala.collection.Iterator", "asofBcInput",
      v => s"$v = inputs[0];")
    // broadcast prepared at codegen time, like BroadcastHashJoinExec
    val idx = ctx.addReferenceObj("asofBcIndex", buildIndex(),
      classOf[AsOfBroadcastIndex].getName)
    val joinedRow = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.expressions.JoinedRow", "asofBcJoinedRow",
      v => s"$v = new org.apache.spark.sql.catalyst.expressions.JoinedRow();")
    val nullRight = ctx.addMutableState("InternalRow", "asofBcNullRight",
      v => s"$v = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(${right.output.length});")

    val leftRow = ctx.freshName("asofBcLeftRow")
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftKeyEv = GenerateUnsafeProjection.createCode(ctx,
      BindReferences.bindReferences(leftKeys, left.output))
    val lTsEv = BindReferences.bindReference(leftTs, left.output).genCode(ctx)
    val matched = ctx.freshName("asofBcMatched")

    // column vars from the joined row — see AsOfJoinExec.doProduce
    ctx.INPUT_ROW = joinedRow
    ctx.currentVars = null
    val resultVars = output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }

    s"""
       |while ($input.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $input.next();
       |  ${lTsEv.code}
       |  InternalRow $matched = null;
       |  if (!${lTsEv.isNull}) {
       |    ${leftKeyEv.code}
       |    $matched = $idx.lookup((UnsafeRow) ${leftKeyEv.value}, ${lTsEv.value});
       |  }
       |  $joinedRow.apply($leftRow, $matched == null ? $nullRight : $matched);
       |  ${evaluateVariables(resultVars)}
       |  ${consume(ctx, resultVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
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
    * pre-renamed to avoid output name collisions.
    * @param broadcastRight broadcast the (small) right side: no shuffle
    *        or sort on the left — the SCD-lookup shape. */
  def backward(leftDf: DataFrame, rightDf: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String, rightTieCol: String,
      broadcastRight: Boolean = false): DataFrame = {
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
      attr(l, leftTsCol), attr(r, rightTsCol), attr(r, rightTieCol),
      broadcastRight = broadcastRight)
    ColumnBridge.ofRows(spark, plan)
  }
}
