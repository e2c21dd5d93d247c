package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule (SURVEY §4.3): rewrites a naive time-interval theta
  * join — `r.ts > l.ts AND r.ts <= l.ts + INTERVAL w` — into a bucketed
  * equi-join. Spark plans the naive form as a broadcast-nested-loop
  * join (O(|L|·|R|)); the rewrite explodes each left row into its two
  * covering w-width time buckets and equi-joins on the bucket key, so
  * the join shuffles hash-partitioned and scales linearly. The original
  * predicate is kept as the residual condition, so the rewrite is
  * semantics-preserving by construction.
  *
  * Fires only on resolved inner joins whose condition is exactly that
  * two-term conjunction (any existing equality key already avoids
  * BNLJ, and extra conjuncts are left to the generic planner).
  *
  * Registered through `GraftExtensions.injectOptimizerRule`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private def intervalMicros(e: Expression): Option[Long] = e match {
    // ANSI day-time interval literal: already microseconds
    case Literal(v: Long, _: org.apache.spark.sql.types.DayTimeIntervalType) => Some(v)
    case Literal(iv: CalendarInterval, _) if iv.months == 0 =>
      Some(iv.days * 86400000000L + iv.microseconds)
    case _ => None
  }

  /** Strips no-op casts (the analyzer wraps ts + interval in a
    * redundant timestamp→timestamp cast until SimplifyCasts runs).
    */
  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, t, _, _) if c.dataType == t => stripCast(c)
    case other => other
  }

  /** Matches r.ts <= l.ts + INTERVAL w (either operand order). */
  private def upperBound(e: Expression): Option[(Expression, Expression, Long)] = e match {
    case LessThanOrEqual(r, add) => stripCast(add) match {
      case TimestampAddInterval(l, iv, _) => intervalMicros(iv).map(w => (l, r, w))
      case _ => None
    }
    case GreaterThanOrEqual(add, r) => stripCast(add) match {
      case TimestampAddInterval(l, iv, _) => intervalMicros(iv).map(w => (l, r, w))
      case _ => None
    }
    case _ => None
  }

  private def sameExpr(a: Expression, b: Expression): Boolean =
    a.canonicalized == b.canonicalized

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(And(c1, c2)), hint) if j.resolved =>
      val attempt = (c1, c2) match {
        case (GreaterThan(r1, l1), ub) =>
          tryRewrite(j, left, right, l1, r1, c1, ub, hint)
        case (ub, GreaterThan(r1, l1)) =>
          tryRewrite(j, left, right, l1, r1, c2, ub, hint)
        case _ => None
      }
      attempt.getOrElse(j)
  }

  private def tryRewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan,
      lTs: Expression, rTs: Expression,
      lowerCond: Expression, upperExpr: Expression,
      hint: JoinHint): Option[LogicalPlan] = {
    upperBound(upperExpr) match {
      case Some((l2, r2, w)) if w > 0 &&
          sameExpr(lTs, l2) && sameExpr(rTs, r2) &&
          lTs.dataType == TimestampType && rTs.dataType == TimestampType &&
          lTs.references.subsetOf(left.outputSet) &&
          rTs.references.subsetOf(right.outputSet) =>
        // left row covers right ts in (lts, lts + w] → buckets ⌊lts/w⌋, +1
        def bucketOf(ts: Expression): Expression =
          IntegralDivide(UnixMicros(ts), Literal(w))
        val lBucketBase = bucketOf(lTs)
        val bucketArr = CreateArray(Seq(lBucketBase, Add(lBucketBase, Literal(1L))))
        val lBucketAttr = AttributeReference(
          "__graft_bucket_l", LongType,
          nullable = bucketArr.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)()
        val leftGen = Generate(
          Explode(bucketArr), unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(lBucketAttr), child = left)
        val rBucketAlias = Alias(bucketOf(rTs), "__graft_bucket_r")()
        val rightProj = Project(right.output :+ rBucketAlias, right)
        val newCond = And(
          EqualTo(lBucketAttr, rBucketAlias.toAttribute),
          And(lowerCond, upperExpr))
        val joined = Join(leftGen, rightProj, Inner, Some(newCond), hint)
        Some(Project(j.output, joined))
      case _ => None
    }
  }
}
