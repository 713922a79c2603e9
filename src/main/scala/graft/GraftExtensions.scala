package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point: registers the engine's native
 * Catalyst expressions as SQL functions at session build time. Enable with
 *   spark.sql.extensions=graft.GraftExtensions
 * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
 * (Per-session registration is also available via
 * [[graft.functions.VectorFunctions.registerAll]].)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity", "cosine_similarity(a, b) - cosine of the angle between two vectors",
      es => CosineSimilarity(es(0), es(1))),
    ("dot_product", "dot_product(a, b) - inner product of two vectors",
      es => DotProduct(es(0), es(1))),
    ("l2_distance", "l2_distance(a, b) - euclidean distance between two vectors",
      es => L2Distance(es(0), es(1))),
    ("l2_norm", "l2_norm(a) - euclidean norm of a vector",
      es => L2Norm(es.head)),
    ("l2_normalize", "l2_normalize(a) - vector scaled to unit norm",
      es => L2Normalize(es.head)))

  override def apply(e: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    // the custom k-NN join operator's physical strategy (plans.KnnJoin)
    e.injectPlannerStrategy(_ => graft.plans.KnnJoinStrategy)
    // algebraic simplification of vector expressions
    e.injectOptimizerRule(_ => graft.plans.VectorSimplification)
  }
}
