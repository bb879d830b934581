package graft.plans

import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound edit-distance predicates.
  *
  * `levenshtein(a, b) <= k` evaluates the full O(|a|·|b|) dynamic program
  * per pair, then throws the number away for a boolean. The thresholded
  * form `levenshtein(a, b, k)` runs the banded O(max(|a|,|b|)·k) DP and
  * returns -1 above the bound, so the predicate is equivalent to
  * `levenshtein(a, b, k) >= 0` — for small k (the only interesting fuzzy
  * thresholds) this is the difference between quadratic and linear work
  * per candidate pair, on what is usually the hottest loop of a blocked
  * fuzzy join.
  *
  * This is the engine's `Rule[LogicalPlan]` surface (custom-operator
  * preference (c), SURVEY.md §2.12): users — including SQL-text users, who
  * have no Column-API workaround — write the natural predicate and the
  * plan gets the banded kernel. Registered via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`) and, for externally
  * built sessions, through `spark.experimental.extraOptimizations` in
  * `GraftFunctions.ensureRegistered`. The rewrite only fires on an
  * UN-thresholded call compared to a non-negative integer literal, and
  * produces a thresholded call — so it cannot match its own output, and a
  * distance VALUE that is projected (not merely compared) is left alone. */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // dist <= k  /  k >= dist
      case LessThanOrEqual(Levenshtein(l, r, None),
          k @ Literal(kv: Int, IntegerType)) if kv >= 0 =>
        GreaterThanOrEqual(Levenshtein(l, r, Some(k)), Literal(0))
      case GreaterThanOrEqual(k @ Literal(kv: Int, IntegerType),
          Levenshtein(l, r, None)) if kv >= 0 =>
        GreaterThanOrEqual(Levenshtein(l, r, Some(k)), Literal(0))
      // dist < k  /  k > dist  (strict: bound by k-1)
      case LessThan(Levenshtein(l, r, None),
          Literal(kv: Int, IntegerType)) if kv >= 1 =>
        GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(kv - 1))),
          Literal(0))
      case GreaterThan(Literal(kv: Int, IntegerType),
          Levenshtein(l, r, None)) if kv >= 1 =>
        GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(kv - 1))),
          Literal(0))
    }
}
