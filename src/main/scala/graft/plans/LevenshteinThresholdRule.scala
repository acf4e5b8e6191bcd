package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `levenshtein(a, b) <= k` (and its mirrored /
  * strict-inequality spellings) rewrites to the early-exit threshold
  * form `levenshtein(a, b, k) >= 0`.
  *
  * Spark's 3-arg levenshtein abandons the DP as soon as the running
  * band exceeds the threshold and returns −1 — O(k·min(n,m)) instead
  * of O(n·m) — but nothing in Catalyst makes the 2-arg predicate reach
  * it: users (and this engine's own fuzzy-join/fuzzy-search queries)
  * naturally write `levenshtein(a, b) <= k`, paying the full DP per
  * candidate pair. On an ER verify stage the candidates are the
  * blocking join's output — at 100 TB easily 10⁹+ string pairs — so
  * the asymptotic cut is a real scan-stage win, applied automatically
  * wherever the predicate appears (Filter OR join condition).
  *
  * Equivalence: for k ≥ 0, dist(a,b) ≤ k ⟺ levenshtein(a,b,k) ≥ 0
  * (the threshold form returns the true distance when it is ≤ k, −1
  * otherwise); null inputs propagate null through both forms, so
  * tri-state filter semantics are untouched. The rewritten expression
  * carries `Some(threshold)`, so the rule cannot re-fire on its own
  * output (fixpoint-safe). PlanSpec asserts the rewrite appears in the
  * optimized plans of the fuzzy queries and pins result equality
  * against a brute-force DP.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def intK(lit: Literal): Option[Int] = lit match {
    case Literal(v: Int, IntegerType) => Some(v)
    case _ => None
  }

  private def bounded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(l, r, None), lit: Literal)
        if intK(lit).exists(_ >= 0) =>
      bounded(l, r, intK(lit).get)
    case GreaterThanOrEqual(lit: Literal, Levenshtein(l, r, None))
        if intK(lit).exists(_ >= 0) =>
      bounded(l, r, intK(lit).get)
    case LessThan(Levenshtein(l, r, None), lit: Literal)
        if intK(lit).exists(_ >= 1) =>
      bounded(l, r, intK(lit).get - 1)
    case GreaterThan(lit: Literal, Levenshtein(l, r, None))
        if intK(lit).exists(_ >= 1) =>
      bounded(l, r, intK(lit).get - 1)
  }
}
