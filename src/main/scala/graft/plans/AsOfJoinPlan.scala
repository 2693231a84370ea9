package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.EmptyBlock
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** The whole-operator extension path (SURVEY §2.14 option c): a
  * custom logical node + planner [[SparkStrategy]] + physical
  * [[SparkPlan]] for the LEFT AS-OF JOIN — an operator Spark has no
  * native form of and whose semantics built-in operators can only
  * emulate (the union+window trick in
  * [[graft.operators.AsOfJoin.asOf]], which carries every probe row
  * through a window buffer).
  *
  * The physical algorithm is the classic time-series merge: both
  * sides hash-partitioned on the equality keys (co-partitioned —
  * `requireAllClusterKeys` so the two hash functions agree) and
  * sorted (keys, time) within partitions; one forward pass walks the
  * two sorted iterators, holding AT MOST ONE candidate build row per
  * key — O(L+R) per partition, zero per-key buffering, no row
  * explosion. EnsureRequirements plants the exchanges and sorts from
  * the declared requirements, so AQE still owns partition sizing.
  *
  * Semantics (same contract as the union+window form): for every
  * probe row, the build row with the greatest time ≤ probe time among
  * equal keys; ties on time resolve to the greatest `rightTie`; no
  * match → null payload. Null keys and null times never match
  * (SQL-join equality), on either side.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute, rightTie: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[Attribute])
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: [[AsOfJoinNode]] → [[AsOfJoinExec]]. Registered
  * by [[graft.GraftExtensions]] (injectPlannerStrategy) or lazily via
  * `spark.experimental.extraStrategies` by
  * [[graft.operators.AsOfJoin.asOfMerge]]. */
object GraftAsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.rightTie, n.payload, n.payloadOut,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute, rightTie: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[Attribute],
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" ->
      SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  /** Both sides clustered on the FULL key list (the two sides' hash
    * partitionings must use identical key sets to be co-partitioned;
    * a subset-key partitioning would route equal keys to different
    * partitions). */
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true),
    ClusteredDistribution(rightKeys, requireAllClusterKeys = true))

  /** Probe sorted (keys, time); build sorted (keys, time, tie) so the
    * last build row consumed at ≤ t is automatically the greatest
    * (time, tie) — the tie-break needs no extra comparison. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending), SortOrder(rightTie, Ascending)))

  /** The merge emits probe rows in their incoming order. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // ---- whole-stage codegen (the SortMergeJoinExec pattern: this
  // node is the stage's produce root; both sorted children arrive as
  // inputRDDs and the merge loop is generated Java, so downstream
  // project/filter fuse into the same span instead of paying
  // per-row iterator virtual calls + 5 interpreted projections —
  // NOTES measured the interpreted loop at 4x the union+window form
  // at 1.3M result rows). doExecute() below remains the
  // spark.sql.codegen.wholeStage=false fallback. ----

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // all reads from the two input rows are generated here, nothing
  // is deferred to the parent's input handling
  override def usedInputs: AttributeSet = AttributeSet.empty

  override def needCopyResult: Boolean = true

  private def ordinalIn(attrs: Seq[Attribute], a: Attribute): Int = {
    val i = attrs.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"attribute $a not found in $attrs")
    i
  }

  protected override def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];")
    val rHead = ctx.addMutableState("InternalRow", "asofRHead")
    val cand = ctx.addMutableState("InternalRow", "asofCand")
    val numOutput = metricTerm(ctx, "numOutputRows")
    val numMatched = metricTerm(ctx, "numMatched")

    val lRow = ctx.freshName("asofLeftRow")
    val lKeyIdx = leftKeys.map(ordinalIn(left.output, _))
    val rKeyIdx = rightKeys.map(ordinalIn(right.output, _))
    val lTimeIdx = ordinalIn(left.output, leftTime)
    val rTimeIdx = ordinalIn(right.output, rightTime)
    val payIdx = payload.map(ordinalIn(right.output, _))
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType

    // a (isNull, value) local pair reading `row` at `idx`, with the
    // assignment code to run at the evaluation site
    def readCol(row: String, idx: Int,
        dt: org.apache.spark.sql.types.DataType,
        tag: String): (String, String, String) = {
      val isNull = ctx.freshName(s"${tag}IsNull")
      val value = ctx.freshName(s"${tag}Value")
      val decl =
        s"""boolean $isNull = true;
           |${CodeGenerator.javaType(dt)} $value =
           |  ${CodeGenerator.defaultValue(dt)};""".stripMargin
      val assign =
        s"""$isNull = $row.isNullAt($idx);
           |if (!$isNull) {
           |  $value = ${CodeGenerator.getValue(row, dt, idx.toString)};
           |}""".stripMargin
      (isNull, value, s"$decl\n$assign")
    }

    // left keys + time, evaluated once per probe row
    val lKeyReads = lKeyIdx.zip(keyTypes).zipWithIndex.map {
      case ((i, dt), k) => readCol(lRow, i, dt, s"asofLk$k") }
    val (ltNull, ltVal, ltCode) =
      readCol(lRow, lTimeIdx, timeType, "asofLt")
    val lUsable = ctx.freshName("asofUsable")

    // right keys + time from the un-consumed head row (re-evaluated
    // each advance iteration — rHead changes inside the loop)
    val rKeyReads = rKeyIdx.zip(keyTypes).zipWithIndex.map {
      case ((i, dt), k) => readCol(rHead, i, dt, s"asofRk$k") }
    val (rtNull, rtVal, rtCode) =
      readCol(rHead, rTimeIdx, timeType, "asofRt")

    // candidate keys from the held candidate row
    val cKeyReads = rKeyIdx.zip(keyTypes).zipWithIndex.map {
      case ((i, dt), k) => readCol(cand, i, dt, s"asofCk$k") }

    def keyComp(comp: String,
        a: Seq[(String, String, String)],
        b: Seq[(String, String, String)]): String =
      a.zip(b).zip(keyTypes).map { case (((_, av, _), (_, bv, _)), dt) =>
        s"""if ($comp == 0) {
           |  $comp = ${ctx.genComp(dt, av, bv)};
           |}""".stripMargin
      }.mkString("\n")

    val comp = ctx.freshName("asofComp")
    val ccomp = ctx.freshName("asofCandComp")
    val advance = ctx.freshName("asofAdvance")
    val matched = ctx.freshName("asofMatched")

    // output: every left column, then the payload columns guarded by
    // the match flag; vars are evaluated inline, so the ExprCode
    // blocks are empty (already-evaluated convention)
    val leftVarReads = left.output.zipWithIndex.map { case (a, i) =>
      readCol(lRow, i, a.dataType, s"asofL$i") }
    val leftVars = left.output.zip(leftVarReads).map {
      case (a, (isNull, value, _)) =>
        ExprCode(EmptyBlock, JavaCode.isNullVariable(isNull),
          JavaCode.variable(value, a.dataType)) }
    val payReads = payIdx.zip(payload).zipWithIndex.map {
      case ((idx, a), k) =>
        val isNull = ctx.freshName(s"asofPayIsNull$k")
        val value = ctx.freshName(s"asofPayValue$k")
        val dt = a.dataType
        val code =
          s"""boolean $isNull = true;
             |${CodeGenerator.javaType(dt)} $value =
             |  ${CodeGenerator.defaultValue(dt)};
             |if ($matched) {
             |  $isNull = $cand.isNullAt($idx);
             |  if (!$isNull) {
             |    $value = ${CodeGenerator.getValue(cand, dt, idx.toString)};
             |  }
             |}""".stripMargin
        (isNull, value, code)
    }
    val payVars = payload.zip(payReads).map {
      case (a, (isNull, value, _)) =>
        ExprCode(EmptyBlock, JavaCode.isNullVariable(isNull),
          JavaCode.variable(value, a.dataType)) }

    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $lRow = (InternalRow) $leftInput.next();
       |  ${lKeyReads.map(_._3).mkString("\n")}
       |  $ltCode
       |  boolean $lUsable =
       |    !(${(lKeyReads.map(_._1) :+ ltNull).mkString(" || ")});
       |  if ($lUsable) {
       |    boolean $advance = true;
       |    while ($advance) {
       |      if ($rHead == null && $rightInput.hasNext()) {
       |        $rHead = (InternalRow) $rightInput.next();
       |      }
       |      if ($rHead == null) {
       |        $advance = false;
       |      } else {
       |        ${rKeyReads.map(_._3).mkString("\n")}
       |        if (${rKeyReads.map(_._1).mkString(" || ")}) {
       |          $rHead = null;  // null keys never match
       |        } else {
       |          int $comp = 0;
       |          ${keyComp(comp, rKeyReads, lKeyReads)}
       |          if ($comp < 0) {
       |            $rHead = null;  // probes ascend: never matches
       |          } else if ($comp > 0) {
       |            $advance = false;
       |          } else {
       |            $rtCode
       |            if ($rtNull) {
       |              $rHead = null;
       |            } else if (${ctx.genComp(timeType, rtVal, ltVal)} <= 0) {
       |              // later-sorted rows overwrite: last <= t wins,
       |              // the greatest (time, tie) by child ordering
       |              $cand = $rHead.copy();
       |              $rHead = null;
       |            } else {
       |              $advance = false;
       |            }
       |          }
       |        }
       |      }
       |    }
       |  }
       |  boolean $matched = false;
       |  if ($lUsable && $cand != null) {
       |    ${cKeyReads.map(_._3).mkString("\n")}
       |    int $ccomp = 0;
       |    ${keyComp(ccomp, cKeyReads, lKeyReads)}
       |    $matched = ($ccomp == 0);
       |  }
       |  if ($matched) $numMatched.add(1);
       |  $numOutput.add(1);
       |  ${leftVarReads.map(_._3).mkString("\n")}
       |  ${payReads.map(_._3).mkString("\n")}
       |  ${consume(ctx, leftVars ++ payVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    val pay = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt: Expression), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt: Expression), rOut)
      val payProj = UnsafeProjection.create(pay, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullPay = new GenericInternalRow(pay.length)
      val joined = new JoinedRow
      // one un-consumed build row + one held candidate per key —
      // the operator's entire state
      var rHead: InternalRow = null
      var cand: InternalRow = null
      var candKey: UnsafeRow = null
      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTimeRow = lTimeProj(l)
          val usable = !lKey.anyNull && !lTimeRow.isNullAt(0)
          if (usable) {
            var advance = true
            while (advance) {
              if (rHead == null && rIter.hasNext) rHead = rIter.next()
              if (rHead == null) advance = false
              else {
                val rKey = rKeyProj(rHead)
                if (rKey.anyNull) rHead = null // null keys never match
                else {
                  val c = keyOrd.compare(rKey, lKey)
                  if (c < 0) rHead = null // probes ascend: never matches
                  else if (c > 0) advance = false
                  else {
                    val rTimeRow = rTimeProj(rHead)
                    if (rTimeRow.isNullAt(0)) rHead = null
                    else if (timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
                      // later-sorted rows overwrite: last ≤ t wins,
                      // which is the greatest (time, tie) by ordering
                      cand = payProj(rHead).copy()
                      candKey = rKey.copy()
                      rHead = null
                    } else advance = false
                  }
                }
              }
            }
          }
          val matched = usable && cand != null &&
            keyOrd.compare(candKey, lKey) == 0
          if (matched) numMatched += 1
          numOutputRows += 1
          resultProj(joined(l, if (matched) cand else nullPay))
        }
      }
    }
  }
}
