package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: guard expensive bounded edit-distance comparisons
  * with their cheap length-difference necessary condition.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (each insert/delete changes length by one), and the guard is O(1)
  * while the distance is O(len²) (or O(k·len) bounded). Rewriting
  *
  *   Filter(levenshtein(a, b) <= k)
  * to
  *   Filter(abs(length(a) - length(b)) <= k && levenshtein(a, b) <= k)
  *
  * lets the conjunction short-circuit the quadratic call for the
  * (typically vast) majority of candidate pairs whose lengths already
  * rule them out. Semantics are unchanged: the added conjunct is implied
  * by the retained one. The rule is idempotent — it skips predicates
  * already guarded.
  */
object LevenshteinLengthGuard extends Rule[LogicalPlan] {

  private def guard(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  private def alreadyGuarded(cond: Expression, a: Expression, b: Expression): Boolean =
    cond.exists {
      case LessThanOrEqual(Abs(Subtract(Length(x), Length(y), _), _), _) =>
        (x.semanticEquals(a) && y.semanticEquals(b)) ||
          (x.semanticEquals(b) && y.semanticEquals(a))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // Only the UNBOUNDED form: the threshold variant returns -1 above
      // its bound, which passes `<= k` but would fail the length guard —
      // rewriting it would change results.
      val rewritten = cond.transformUp {
        case cmp @ LessThanOrEqual(Levenshtein(a, b, None), k: Literal)
            if k.foldable && !alreadyGuarded(cond, a, b) =>
          And(guard(a, b, k), cmp)
        case cmp @ LessThan(Levenshtein(a, b, None), k: Literal)
            if k.foldable && !alreadyGuarded(cond, a, b) =>
          And(guard(a, b, k), cmp)
      }
      if (rewritten.fastEquals(cond)) f else Filter(rewritten, child)
  }
}
