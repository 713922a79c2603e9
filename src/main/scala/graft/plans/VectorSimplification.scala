package graft.plans

import graft.functions.{CosineSimilarity, DotProduct, L2Normalize}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rule: algebraic simplification of the vector expressions
 * (injected via `GraftExtensions`, SURVEY §4's custom-Catalyst tier).
 *
 * Cosine similarity is invariant under positive scaling of either input —
 * so an `l2_normalize` feeding it only materializes an array per row for
 * nothing. Rewrites (exactly value-preserving for ALL inputs, including
 * mismatched lengths, because cosine's prefix norms cancel the scale; the
 * zero-vector guard agrees on both sides since normalize(0) = 0):
 *
 *   cosine(l2_normalize(a), b)   → cosine(a, b)
 *   cosine(a, l2_normalize(b))   → cosine(a, b)
 *
 * NOT rewritten: dot(l2_normalize(a), l2_normalize(b)) → cosine(a, b).
 * That identity only holds when a and b have equal lengths (normalize
 * divides by the FULL-array norm while cosine's norms cover the min-length
 * prefix) — lengths are unknown statically, so the rewrite would silently
 * change results on ragged inputs.
 */
object VectorSimplification extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(L2Normalize(a), b) => CosineSimilarity(a, b)
      case CosineSimilarity(a, L2Normalize(b)) => CosineSimilarity(a, b)
    }
}
