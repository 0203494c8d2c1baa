package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite bounded edit-distance FILTERS into Spark's
  * thresholded Levenshtein.
  *
  *   levenshtein(a, b) <= k   ==>   levenshtein(a, b, k) >= 0
  *
  * The 2-arg form fills the full O(|a|·|b|) DP matrix per row; the
  * thresholded form computes only the 2k+1-wide diagonal band and bails
  * out early (returning -1, hence the `>= 0` equivalence), so a fuzzy
  * match like Dedup.fuzzyPairs drops from O(n·m) to O(k·min(n,m)) per
  * candidate pair — the difference between feasible and not on a 100 TB
  * entity-resolution pass where k is 2-3 and names are long.
  *
  * Semantics are preserved exactly, including nulls: null inputs make
  * both forms null, which Filter and Join conditions treat as false.
  * Conditions inside Filter AND inner-Join conditions are rewritten (the
  * optimizer pushes a post-join distance filter into the join condition,
  * so matching Filter alone would miss the exact case that matters for
  * blocked fuzzy joins); a projected distance column keeps the full
  * computation (its value, not a bound, is the result). The rule is
  * idempotent by construction: the rewritten form carries threshold =
  * Some(k), which no pattern matches.
  *
  * Registered via SparkSessionExtensions.injectOptimizerRule in
  * graft.Sessions.local — the documented extension path (SURVEY.md §4.3),
  * no private Spark API touched.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def bounded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(Levenshtein(l, r, None),
        Literal(k: Int, IntegerType)) if k >= 0 =>
      bounded(l, r, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType),
        Levenshtein(l, r, None)) if k >= 0 =>
      bounded(l, r, k)
    case LessThan(Levenshtein(l, r, None),
        Literal(k: Int, IntegerType)) if k >= 1 =>
      bounded(l, r, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType),
        Levenshtein(l, r, None)) if k >= 1 =>
      bounded(l, r, k - 1)
    // d == k  <=>  banded distance(threshold k) == k: d <= k returns
    // d itself, d > k returns -1 which can never equal k (k >= 0)
    case EqualTo(Levenshtein(l, r, None),
        kl @ Literal(k: Int, IntegerType)) if k >= 0 =>
      EqualTo(Levenshtein(l, r, Some(kl)), kl)
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = rewrite(cond)
      if (newCond.fastEquals(cond)) f else Filter(newCond, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val newCond = rewrite(cond)
      if (newCond.fastEquals(cond)) j else j.copy(condition = Some(newCond))
  }
}
