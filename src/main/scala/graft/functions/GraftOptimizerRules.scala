package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: threshold comparisons against the built-in
  * O(n·m) `levenshtein(a, b)` rewrite to the banded O(k·n)
  * `levenshtein_bounded(a, b, k)` (functions/LevenshteinBounded.scala)
  * when the threshold is a literal — the SQL the user naturally writes
  * (`WHERE levenshtein(a, b) <= 2`) gets the plan an expert would have
  * hand-tuned. Exactness: `levenshtein_bounded(a, b, k) = min(lev, k+1)`
  * with identical null behavior, so for every comparison shape below the
  * rewritten predicate is VALUE-IDENTICAL to the original
  * (LevenshteinBoundedSpec pins the under-threshold parity; the rule spec
  * pins each shape end-to-end):
  *
  *   lev ≤ k  ⟺ B(k) ≤ k          lev > k  ⟺ B(k) > k
  *   lev < k  ⟺ B(k−1) < k        lev ≥ k  ⟺ B(k−1) ≥ k      (k ≥ 1)
  *   lev = k  ⟺ B(k) = k          lev ≠ k  ⟺ B(k) ≠ k
  *
  * A `levenshtein` that already carries its own threshold argument, or a
  * non-literal bound, is left untouched. Registered via
  * `GraftSparkExtensions` (injectOptimizerRule) and
  * `GraftFunctions.register` (experimental.extraOptimizations).
  */
object BoundedLevenshteinRule extends Rule[LogicalPlan] {

  private def b(a: Expression, bb: Expression, k: Int): Expression =
    LevenshteinBounded(a, bb, Literal(k))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // lev on the left, literal bound on the right
    case LessThanOrEqual(Levenshtein(a, c, None), l @ Literal(k: Int, IntegerType)) if k >= 0 =>
      LessThanOrEqual(b(a, c, k), l)
    case GreaterThan(Levenshtein(a, c, None), l @ Literal(k: Int, IntegerType)) if k >= 0 =>
      GreaterThan(b(a, c, k), l)
    case LessThan(Levenshtein(a, c, None), l @ Literal(k: Int, IntegerType)) if k >= 1 =>
      LessThan(b(a, c, k - 1), l)
    case GreaterThanOrEqual(Levenshtein(a, c, None), l @ Literal(k: Int, IntegerType)) if k >= 1 =>
      GreaterThanOrEqual(b(a, c, k - 1), l)
    case EqualTo(Levenshtein(a, c, None), l @ Literal(k: Int, IntegerType)) if k >= 0 =>
      EqualTo(b(a, c, k), l)
    // literal bound on the left, lev on the right (mirrored shapes)
    case GreaterThanOrEqual(l @ Literal(k: Int, IntegerType), Levenshtein(a, c, None)) if k >= 0 =>
      GreaterThanOrEqual(l, b(a, c, k))
    case LessThan(l @ Literal(k: Int, IntegerType), Levenshtein(a, c, None)) if k >= 0 =>
      LessThan(l, b(a, c, k))
    case GreaterThan(l @ Literal(k: Int, IntegerType), Levenshtein(a, c, None)) if k >= 1 =>
      GreaterThan(l, b(a, c, k - 1))
    case LessThanOrEqual(l @ Literal(k: Int, IntegerType), Levenshtein(a, c, None)) if k >= 1 =>
      LessThanOrEqual(l, b(a, c, k - 1))
    case EqualTo(l @ Literal(k: Int, IntegerType), Levenshtein(a, c, None)) if k >= 0 =>
      EqualTo(l, b(a, c, k))
  }
}
