package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a KEYLESS interval join
  * (`b.t BETWEEN a.t + lo AND a.t + hi`, long microseconds, no
  * equality conjuncts) into the bucketed equi-join shape of
  * [[graft.operators.RangeJoin]] — Spark's own planner can only run
  * it as BroadcastNestedLoopJoin / CartesianProduct, an O(n·m) scan.
  *
  * Bucketing time at the window width w = hi − lo turns the interval
  * condition into an equality: the probe side explodes into its two
  * covered bucket ids, the build side computes its one bucket id,
  * and the original range predicate survives as the exact filter on
  * the equi-join's output. The rewritten join carries an equality
  * conjunct, so the rule cannot match its own output (fixed point).
  *
  * Scope guards (all must hold, otherwise the plan is untouched):
  * inner join, a condition with NO cross-side equality conjunct, and
  * a lower+upper bound pair over the same two LongType attributes on
  * opposite sides with foldable integral offsets. Strict bounds
  * tighten by one microsecond (integer semantics).
  */
object BucketedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** e as (attr, additive offset): `t`, `t + c`, `c + t`, `t - c`
    * with any foldable integral c. */
  private def attrPlusLit(e: Expression): Option[(AttributeReference, Long)] = {
    def longOf(c: Expression): Option[Long] =
      if (c.foldable && !c.exists(_.isInstanceOf[AttributeReference]))
        c.eval() match {
          case l: java.lang.Long => Some(l)
          case i: java.lang.Integer => Some(i.toLong)
          case s: java.lang.Short => Some(s.toLong)
          case b: java.lang.Byte => Some(b.toLong)
          case _ => None
        }
      else None
    e match {
      case a: AttributeReference if a.dataType == LongType => Some((a, 0L))
      case Add(a: AttributeReference, c, _) if a.dataType == LongType =>
        longOf(c).map((a, _))
      case Add(c, a: AttributeReference, _) if a.dataType == LongType =>
        longOf(c).map((a, _))
      case Subtract(a: AttributeReference, c, _) if a.dataType == LongType =>
        longOf(c).map(v => (a, -v))
      case _ => None
    }
  }

  /** A conjunct as candidate bounds: (buildAttr, probeAttr, offset,
    * isLower). `B >= P + c` ⇔ lower; `B <= P + c` ⇔ upper; both
    * orientations of each comparison, strict forms tightened ±1. */
  private def boundCandidates(
      e: Expression): Seq[(AttributeReference, AttributeReference, Long, Boolean)] = {
    def of(l: Expression, r: Expression, isLower: Boolean, tighten: Long) =
      for {
        (b, bc) <- attrPlusLit(l).toSeq
        (p, pc) <- attrPlusLit(r).toSeq
        // bare build attr on the bounded side: B + bc ≥ P + pc ⇔
        // B ≥ P + (pc − bc)
      } yield (b, p, pc - bc + tighten, isLower)
    e match {
      case GreaterThanOrEqual(l, r) =>
        of(l, r, isLower = true, 0L) ++ of(r, l, isLower = false, 0L)
      case LessThanOrEqual(l, r) =>
        of(l, r, isLower = false, 0L) ++ of(r, l, isLower = true, 0L)
      case GreaterThan(l, r) =>
        of(l, r, isLower = true, 1L) ++ of(r, l, isLower = false, -1L)
      case LessThan(l, r) =>
        of(l, r, isLower = false, -1L) ++ of(r, l, isLower = true, 1L)
      case _ => Nil
    }
  }

  private def crossSideEquality(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        val (ra, rb) = (a.references, b.references)
        ra.nonEmpty && rb.nonEmpty &&
          ((ra.subsetOf(left.outputSet) && rb.subsetOf(right.outputSet)) ||
            (ra.subsetOf(right.outputSet) && rb.subsetOf(left.outputSet)))
      case _ => false
    }

  /** floor(t / w) in exact integer math (Pmod is non-negative, so the
    * division input is an exact multiple — double division would
    * wobble at bucket edges). */
  private def bucketOf(t: Expression, w: Long): Expression =
    new IntegralDivide(new Subtract(t, new Pmod(t, Literal(w))),
      Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !crossSideEquality(splitConjunctivePredicates(cond), left, right) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val candidates = conjuncts.flatMap(boundCandidates)
      // one lower and one upper bound over the same (build, probe)
      // attribute pair, attrs on opposite join sides
      val pair = (for {
        (b1, p1, lo, true) <- candidates
        (b2, p2, hi, false) <- candidates
        if b1.semanticEquals(b2) && p1.semanticEquals(p2) && hi > lo
        sides <- {
          if (left.outputSet.contains(p1) && right.outputSet.contains(b1))
            Some((b1, p1, lo, hi, true))    // probe on the left
          else if (right.outputSet.contains(p1) &&
              left.outputSet.contains(b1))
            Some((b1, p1, lo, hi, false))   // probe on the right
          else None
        }
      } yield sides).headOption
      pair match {
        case None => j
        case Some((bAttr, pAttr, lo, hi, probeLeft)) =>
          val w = hi - lo
          val bktProbe = AttributeReference("_graft_bkt_p", LongType,
            nullable = true)()
          val probeGen = (side: LogicalPlan) => {
            val base = bucketOf(new Add(pAttr, Literal(lo)), w)
            Generate(
              Explode(CreateArray(Seq(base, new Add(base, Literal(1L))))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bktProbe), child = side)
          }
          val bktBuildAlias = Alias(bucketOf(bAttr, w), "_graft_bkt_b")()
          val buildProj = (side: LogicalPlan) =>
            Project(side.output :+ bktBuildAlias, side)
          val (newLeft, newRight) =
            if (probeLeft) (probeGen(left), buildProj(right))
            else (buildProj(left), probeGen(right))
          val newCond = And(
            EqualTo(bktProbe, bktBuildAlias.toAttribute), cond)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
      }
  }
}
