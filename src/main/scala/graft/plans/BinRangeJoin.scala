package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: accelerate PURE range joins.
  *
  * An inner join whose only cross-side predicates are
  * `p >= s AND p < s + <positive literal>` (epoch-long point `p` from
  * one side, interval start `s` from the other, no equality conjunct)
  * has no equi key, so Spark's join strategies bottom out at
  * BroadcastNestedLoopJoin — O(|points| x |intervals|) comparisons.
  * This rule rewrites the LOGICAL join into the binned form that
  * [[graft.operators.RangeJoin.pointInInterval]] builds by hand:
  *
  *   - bin width B = interval length L;
  *   - the interval side explodes to the <= 2 bins it overlaps;
  *   - the point side computes its single bin;
  *   - equi-join on the bin, original range predicate kept as the
  *     residual condition.
  *
  * Each (point, interval) pair meets in exactly one bin (the point's),
  * so the rewrite is duplicate-free and result-identical — including
  * null handling: a null `p` or `s` fails the original predicate under
  * inner-join semantics and produces a null bin key here, which the
  * equi-join likewise drops. Bins use floor division
  * `(x - pmod(x, B)) div B`, correct for negative epochs too.
  *
  * Restricted to LongType/IntegerType point/start expressions (cast
  * timestamps to epoch seconds); joins that already carry an equality
  * conjunct are left alone — Spark hash-joins those fine without us.
  * Injected by [[graft.GraftExtensions]].
  */
object BinRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  /** floor(x / b) for b > 0, exact on longs: x - pmod(x,b) is the
    * largest multiple of b that is <= x, and its integral division is
    * exact — avoids both truncate-toward-zero (wrong for negatives)
    * and double rounding (wrong past 2^53). */
  private def floorDiv(x: Expression, b: Long): Expression =
    new IntegralDivide(
      new Subtract(x, new Pmod(x, Literal(b))), Literal(b))

  private def positiveLiteral(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) if v > 0 => Some(v)
    case Literal(v: Int, IntegerType) if v > 0 => Some(v.toLong)
    case _ => None
  }

  /** Extracts (point, start, length) when the conjuncts contain
    * `p >= s` and `p < s + len` with p from `pointSide` and s from
    * `intervalSide`. */
  private def matchRange(
      conjuncts: Seq[Expression],
      pointSide: LogicalPlan,
      intervalSide: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def fromPoint(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(pointSide.outputSet) &&
        e.deterministic && isIntegral(e)
    def fromInterval(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(intervalSide.outputSet) &&
        e.deterministic && isIntegral(e)
    val lower = conjuncts.collectFirst {
      case GreaterThanOrEqual(p, s) if fromPoint(p) && fromInterval(s) => (p, s)
      case LessThanOrEqual(s, p) if fromPoint(p) && fromInterval(s) => (p, s)
    }
    lower.flatMap { case (p, s) =>
      conjuncts.collectFirst {
        case LessThan(p2, Add(s2, l, _))
            if p2.semanticEquals(p) && s2.semanticEquals(s) &&
              positiveLiteral(l).isDefined =>
          (p, s, positiveLiteral(l).get)
        case GreaterThan(Add(s2, l, _), p2)
            if p2.semanticEquals(p) && s2.semanticEquals(s) &&
              positiveLiteral(l).isDefined =>
          (p, s, positiveLiteral(l).get)
      }
    }
  }

  private def crossSideEquality(
      conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case EqualNullSafe(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case _ => false
    }

  /** Post-analysis no implicit casts are inserted, so IntegerType
    * operands must be cast to long explicitly before mixing with the
    * Long bin literals (an un-cast mix fails BinaryOperator's type
    * check and invalidates the plan). */
  private def asLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    case _ => Cast(e, LongType)
  }

  private def rewrite(
      join: Join,
      pointSide: LogicalPlan,
      intervalSide: LogicalPlan,
      hint: JoinHint,
      p0: Expression,
      s0: Expression,
      len: Long): LogicalPlan = {
    val (p, s) = (asLong(p0), asLong(s0))
    val bin = len // bin width = interval length: <= 2 bins per interval
    val pBin = Alias(floorDiv(p, bin), "__brj_bin_p")()
    val newPoint = Project(pointSide.output :+ pBin, pointSide)
    // Sequence is TimeZoneAwareExpression: set the zone here — the
    // analyzer's ResolveTimeZone already ran, so an unset zone would
    // leave the rewritten plan unresolved
    val binSeq = Sequence(
      floorDiv(s, bin),
      floorDiv(new Add(s, Literal(len - 1)), bin),
      None,
      Some(conf.sessionLocalTimeZone))
    val ivBinAttr = AttributeReference("__brj_bin_i", LongType, nullable = false)()
    val newInterval = Generate(Explode(binSeq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(ivBinAttr),
      child = intervalSide)
    val newCond = And(EqualTo(pBin.toAttribute, ivBinAttr),
      join.condition.get)
    val binned = Join(newPoint, newInterval, Inner, Some(newCond), hint)
    // restore the original output (and column order)
    Project(join.output, binned)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (crossSideEquality(conjuncts, left, right)) j
      else {
        matchRange(conjuncts, left, right)
          .map { case (p, s, len) => rewrite(j, left, right, j.hint, p, s, len) }
          .orElse(matchRange(conjuncts, right, left)
            .map { case (p, s, len) =>
              // children swap sides -> side-specific hints swap with them
              rewrite(j, right, left,
                JoinHint(j.hint.rightHint, j.hint.leftHint), p, s, len)
            })
          .getOrElse(j)
      }
  }
}
