package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
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
  extends BinaryExecNode {

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
