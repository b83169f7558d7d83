package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Optimizer rule: rewrite the naive trailing-window range join into the
 * bin-bucketed equi-join — the whole-plan tier of the custom-operator
 * ladder (`Rule[LogicalPlan]` via `SparkSessionExtensions` /
 * `spark.experimental.extraOptimizations`), where composing DataFrame
 * operators can't help because the PROBLEM is what the user already
 * wrote: an inner join whose condition is
 *
 *   [l.key = r.key AND] r.ts > l.ts - W AND r.ts <= l.ts    (W literal)
 *
 * executes quadratically: with no key at all Spark plans the inequality
 * pair as BroadcastNestedLoopJoin (per-left-row scans of the right
 * side); with a key it hash/merge-joins on the key alone and evaluates
 * the range as a residual — every (left, right) pair PER KEY is
 * generated before filtering, so one hot key is quadratic in its row
 * count. Both die at 100 TB. The rewrite is the algebra of
 * [[graft.operators.RangeJoin]] (window-width time bins; a trailing
 * window intersects exactly bin(l) and bin(l)-1; equi-join on (key, bin);
 * exact predicates re-applied above), applied mechanically to the plan:
 *
 *   Project(original output)                 — bins dropped, schema kept
 *     Filter(range conjuncts + leftovers)    — exactness restored
 *       Join(..., key = key AND binL = binR) — plain equi-join: shuffle/
 *         Generate(explode[bin, bin-1], l)     broadcast, AQE-eligible
 *         Project(r + bin, r)
 *
 * Safe for negative timestamps: `div` truncation makes bin 0 span
 * (-W, W) and every other bin width W, so consecutive boundaries are
 * ≥ W apart and a right row within (l-W, l] still lands in one of the
 * two probed bins. Null timestamps never match in either form (null
 * range predicate vs null bin key). Guard: a join whose inputs already
 * carry a `__bin`-prefixed column is bin-bucketed — by this rule or by
 * the hand-built RangeJoin operators — and is never rewritten again, so
 * the rule is idempotent under re-optimization and rule-batch
 * fixed-point iteration.
 *
 * Scope (documented, asserted by spec): INNER joins, LongType
 * timestamps, strict lower bound `r > l - W`, inclusive upper `r <= l`,
 * W a positive integer literal; an equality conjunct is used as a
 * co-key when present (keyed attribution joins) and the bin equality
 * stands alone when not (the BNLJ case). Any other conjuncts ride
 * along into the exactness filter.
 */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {
  private val marker = "__bin_graft" // shares the __bin prefix the guard scans
  // any __bin* column marks a plan that is ALREADY bin-bucketed — ours, or
  // the hand-built graft.operators.RangeJoin form (whose post-join range
  // filter the optimizer folds back into the join condition, recreating
  // the naive-looking pattern over an equi-join that is already safe)
  private val binned = "__bin"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        if j.resolved &&
          !left.output.exists(_.name.startsWith(binned)) &&
          !right.output.exists(_.name.startsWith(binned)) =>
      rewrite(j, left, right, cond).getOrElse(j)
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet)

    val keyEq = conjuncts.collectFirst {
      case e @ EqualTo(a, b) if fromLeft(a) && fromRight(b) => e
      case e @ EqualTo(a, b) if fromRight(a) && fromLeft(b) => e
    }
    // r.ts > l.ts - W, either written orientation
    def lowerBound(e: Expression): Option[(Attribute, Attribute, Long)] =
      e match {
        case GreaterThan(r: Attribute, Subtract(l: Attribute, w, _))
            if fromRight(r) && fromLeft(l) => longLit(w).map(wv => (l, r, wv))
        case LessThan(Subtract(l: Attribute, w, _), r: Attribute)
            if fromRight(r) && fromLeft(l) => longLit(w).map(wv => (l, r, wv))
        case _ => None
      }
    // r.ts <= l.ts, either written orientation
    def upperBound(e: Expression): Option[(Attribute, Attribute)] = e match {
      case LessThanOrEqual(r: Attribute, l: Attribute)
          if fromRight(r) && fromLeft(l) => Some((l, r))
      case GreaterThanOrEqual(l: Attribute, r: Attribute)
          if fromRight(r) && fromLeft(l) => Some((l, r))
      case _ => None
    }

    for {
      (lts, rts, w) <- conjuncts.flatMap(lowerBound(_)).headOption
      if w > 0
      if lts.dataType == LongType && rts.dataType == LongType
      if conjuncts.flatMap(upperBound(_)).contains((lts, rts))
    } yield {
      val wLit = Literal(w)
      val lBin = new IntegralDivide(lts, wLit)
      val binArray = CreateArray(Seq(lBin, new Subtract(lBin, Literal(1L))))
      val lBinAttr = AttributeReference(marker, LongType, nullable = true)()
      val gen = Generate(Explode(binArray), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(lBinAttr), child = left)
      val rBinAlias = Alias(new IntegralDivide(rts, wLit), marker + "_r")()
      val projR = Project(right.output :+ rBinAlias, right)
      val binEq = EqualTo(lBinAttr, rBinAlias.toAttribute)
      val newJoin = Join(gen, projR, Inner,
        Some(keyEq.map(And(_, binEq)).getOrElse(binEq)), JoinHint.NONE)
      val residual = conjuncts.filterNot(c => keyEq.contains(c))
      Project(j.output, Filter(residual.reduce(And), newJoin))
    }
  }
}

/** `spark.sql.extensions` entry point — new sessions built with this
  * class get [[BinnedRangeJoinRule]] injected; live sessions can add the
  * same object to `spark.experimental.extraOptimizations`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => BinnedRangeJoinRule)
}
