package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite an interval-containment join
  *
  *   points ⋈ intervals  ON  pKey = iKey AND lo <= t AND t <= hi
  *
  * which Spark plans as a nested loop per key group (O(n·m)), into the
  * binned equality form `store.DocumentStore.rangeJoinBinned` builds by
  * hand: explode each interval into the `binSize`-wide time bins it
  * covers, join on (key, bin) — a hash join — and keep the exact
  * containment predicate as a post-filter. Row-identical to the original
  * join because each (point, interval) pair meets in exactly one bin (the
  * point's own), so no duplicates are introduced.
  *
  * Injected via `GraftExtensions` (spark.sql.extensions) — the
  * `Rule[LogicalPlan]` tier of Catalyst extension: user code writes the
  * natural inequality join and the optimizer picks the scalable plan.
  */
case class RangeJoinBinning(binSize: Long) extends Rule[LogicalPlan] {

  private def isLongAttr(e: Expression): Option[Attribute] = e match {
    case a: Attribute if a.dataType == LongType => Some(a)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      tryRewrite(j, left, right, cond, hint).getOrElse(j)
  }

  private def tryRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                         cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    // flatten conjuncts
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    val cs = conjuncts(cond)
    if (cs.size != 3) return None

    val eqs = cs.collect { case EqualTo(a: Attribute, b: Attribute) => (a, b) }
    val ges = cs.collect { // t >= lo in either spelling
      case GreaterThanOrEqual(a, b) => (a, b)
      case LessThanOrEqual(a, b) => (b, a)
    }
    if (eqs.size != 1 || ges.size != 2) return None

    def side(a: Attribute): Option[Boolean] = // true = left
      if (left.outputSet.contains(a)) Some(true)
      else if (right.outputSet.contains(a)) Some(false)
      else None

    // identify point attr (appears as the >= lhs in one conjunct and the
    // >= rhs in the other) and the interval bounds; try both conjunct
    // orderings
    def extract(g1: (Expression, Expression), g2: (Expression, Expression)) = for {
      (t1, lo) <- isLongAttr(g1._1).zip(isLongAttr(g1._2))
      (hi, t2) <- isLongAttr(g2._1).zip(isLongAttr(g2._2))
      if t1.semanticEquals(t2)
      tSide <- side(t1)
      loSide <- side(lo)
      hiSide <- side(hi)
      if loSide == hiSide && loSide != tSide
    } yield (t1, lo, hi, tSide)
    val candidates = extract(ges(0), ges(1)).orElse(extract(ges(1), ges(0)))

    candidates.flatMap { case (t, lo, hi, pointsOnLeft) =>
      val (points, intervals) = if (pointsOnLeft) (left, right) else (right, left)
      val bs = Literal(binSize, LongType)

      val pBin = AttributeReference("__p_bin", LongType, nullable = true)()
      val pointsBinned = Project(points.output :+
        Alias(IntegralDivide(t, bs), "__p_bin")(exprId = pBin.exprId), points)

      // Sequence is TimeZoneAwareExpression: without an explicit zone the
      // rewritten plan is unresolved and the optimizer rejects the rule
      val iBinGen = Explode(Sequence(
        IntegralDivide(lo, bs), IntegralDivide(hi, bs), None,
        Some(conf.sessionLocalTimeZone)))
      val iBin = AttributeReference("__i_bin", LongType, nullable = true)()
      val intervalsBinned = Generate(iBinGen, unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(iBin), intervals)

      val newCond = And(
        eqs.map { case (a, b) => EqualTo(a, b): Expression }.head,
        EqualTo(pBin, iBin))
      val (nl, nr) = if (pointsOnLeft) (pointsBinned, intervalsBinned)
                     else (intervalsBinned, pointsBinned)
      val joined = Join(nl, nr, Inner, Some(newCond), hint)
      val filtered = Filter(And(GreaterThanOrEqual(t, lo), LessThanOrEqual(t, hi)), joined)
      Some(Project(j.output, filtered))
    }
  }
}
