package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite an inequality-ONLY point-in-interval join —
  * which Spark can only plan as BroadcastNestedLoopJoin or a cartesian
  * product, O(|left| × |right|) — into the bin equi-join
  * (`graft.operators.RangeJoin`'s plan, produced automatically):
  *
  * {{{
  *   a JOIN b ON a.s <= b.p AND b.p < a.e        -- O(n·m) nested loop
  *   ⇒ explode a to overlapped bins, bin b.p,     -- hash join on bin
  *     equi-join on the bin key, exact residual
  * }}}
  *
  * A point belongs to exactly one bin, so the rewrite preserves output
  * multiplicity exactly; the original condition is re-applied as the
  * residual filter, so null/empty-interval semantics are untouched
  * (proven differentially in RangeBinJoinRuleSpec).
  *
  * Fire conditions (deliberately strict — anything else is left to
  * Spark's own planner):
  *  - inner join whose condition is EXACTLY the two-sided sandwich
  *    `s <= p && p < e` (any operand order), no other conjuncts — a
  *    join that also has an equality conjunct already plans as a hash
  *    join with the range as residual, which is fine;
  *  - `s`/`e` from one side and `p` from the other, all LongType (the
  *    library's range-join domain contract: callers convert temporal
  *    types to epoch numbers).
  *
  * The bin width comes from `spark.graft.rangeJoin.binWidth` (default
  * 1024); any width is correct, width only tunes the explode factor vs
  * bin selectivity. `spark.graft.rangeJoin.enabled=false` disables the
  * rewrite. Registered via GraftExtensions (injectOptimizerRule).
  */
case class RangeBinJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.rangeJoin.enabled", "true").toBoolean
  private def binWidth: Long =
    spark.conf.get("spark.graft.rangeJoin.binWidth", "1024").toLong

  /** s <= p (or p >= s) and p < e (or e > p), as (point, bound). */
  private object Sandwich {
    def lower(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(s, p) => Some((p, s))
      case GreaterThanOrEqual(p, s) => Some((p, s))
      case _ => None
    }
    def upper(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThan(p, ex) => Some((p, ex))
      case GreaterThan(ex, p) => Some((p, ex))
      case _ => None
    }
  }

  private def floorDiv(x: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || binWidth <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond).getOrElse(j)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 2) return None
    val parsed = (for {
      lo <- Sandwich.lower(conjuncts(0)).toSeq; hi <- Sandwich.upper(conjuncts(1)).toSeq
    } yield (lo, hi)) ++ (for {
      lo <- Sandwich.lower(conjuncts(1)).toSeq; hi <- Sandwich.upper(conjuncts(0)).toSeq
    } yield (lo, hi))
    parsed.collectFirst {
      case ((p1, s), (p2, e))
        if p1.semanticEquals(p2) &&
          Seq(p1, s, e).forall(_.dataType == LongType) &&
          Seq(p1, s, e).forall(_.deterministic) &&
          sided(p1, s, e, left, right).isDefined =>
        val (intervalSide, pointSide, intervalIsLeft) =
          sided(p1, s, e, left, right).get
        val w = binWidth
        // interval side: keep only non-empty intervals, explode to bins
        val binAttr = AttributeReference("__graft_bin", LongType,
          nullable = false)()
        // Sequence is TimeZoneAwareExpression: resolution requires a
        // timezone even for integral args
        val seq = Sequence(floorDiv(s, w),
          floorDiv(Subtract(e, Literal(1L)), w), None,
          Some(spark.sessionState.conf.sessionLocalTimeZone))
        val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(binAttr),
          child = Filter(LessThan(s, e), intervalSide))
        // point side: the single bin the point falls in
        val pbin = Alias(floorDiv(p1, w), "__graft_pbin")()
        val proj = Project(pointSide.output :+ pbin, pointSide)
        val (l2, r2) =
          if (intervalIsLeft) (gen, proj: LogicalPlan) else (proj: LogicalPlan, gen)
        val joined = Join(l2, r2, Inner,
          Some(EqualTo(binAttr, pbin.toAttribute)), JoinHint.NONE)
        // residual = the ORIGINAL condition: exact semantics, and the
        // rewritten join no longer matches this rule's pattern
        Project(j.output, Filter(cond, joined))
    }
  }

  /** Returns (intervalChild, pointChild, intervalIsLeft) when s,e are
    * from one child and p from the other. */
  private def sided(p: Expression, s: Expression, e: Expression,
                    left: LogicalPlan, right: LogicalPlan)
      : Option[(LogicalPlan, LogicalPlan, Boolean)] = {
    val bounds = s.references ++ e.references
    val point = p.references
    if (bounds.nonEmpty && point.nonEmpty &&
      bounds.subsetOf(left.outputSet) && point.subsetOf(right.outputSet))
      Some((left, right, true))
    else if (bounds.nonEmpty && point.nonEmpty &&
      bounds.subsetOf(right.outputSet) && point.subsetOf(left.outputSet))
      Some((right, left, false))
    else None
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(a, b) =>
        splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
      case other => Seq(other)
    }
}
