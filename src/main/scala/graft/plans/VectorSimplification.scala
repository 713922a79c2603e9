package graft.plans

import graft.functions.{CosineSimilarity, DotProduct, L2Normalize}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rule: algebraic simplification of the vector expressions
 * (injected via `GraftExtensions`, SURVEY §4's custom-Catalyst tier).
 *
 * Cosine similarity is invariant under L2 normalization of either input,
 * and the dot product of two normalized vectors IS the cosine — so any
 * `l2_normalize` feeding those kernels only materializes an array per row
 * for nothing. Rewrites (sound in exact arithmetic, equal within 1 ulp in
 * floating point — same class of rewrite as Spark's own arithmetic
 * reassociations; the zero-vector guard agrees on both sides because
 * normalize(0) = 0 and cosine-with-0 = 0):
 *
 *   cosine(l2_normalize(a), b)              → cosine(a, b)
 *   cosine(a, l2_normalize(b))              → cosine(a, b)
 *   dot(l2_normalize(a), l2_normalize(b))   → cosine(a, b)
 */
object VectorSimplification extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(L2Normalize(a), L2Normalize(b)) => CosineSimilarity(a, b)
      case CosineSimilarity(L2Normalize(a), b) => CosineSimilarity(a, b)
      case CosineSimilarity(a, L2Normalize(b)) => CosineSimilarity(a, b)
    }
}
