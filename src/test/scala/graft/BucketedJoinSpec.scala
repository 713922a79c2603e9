package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/**
 * Evidence for the 100 TB co-location strategy: a big⋈big equi-join on
 * the collection key normally shuffles BOTH corpus-sized sides every
 * query. Writing the tables bucketed by that key (`bucketBy` — Spark's
 * hive-style bucketing) pre-partitions the data ON DISK, so repeated
 * joins (documents⋈embeddings, chunks⋈scores, …) plan as a shuffle-FREE
 * sort-merge join: the exchange is paid once at write time and amortized
 * over every subsequent query — the disk-layout analogue of
 * `repartition()` co-partitioning.
 */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def shuffles(plan: SparkPlan): Int =
    plan.collect { case e: ShuffleExchangeExec => e }.size

  test("bucketed tables join shuffle-free; unbucketed pay two exchanges") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_embs")
    val docs = (0L until 2000L).map(i => (i, s"doc text $i")).toDF("doc_id", "text")
    val embs = (0L until 2000L).map(i => (i, Array.fill(8)(i.toFloat))).toDF("doc_id", "embedding")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_docs")
    embs.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_embs")
    // AQE off for a deterministic physical plan to inspect
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force big⋈big
    try {
      val bucketed = spark.table("b_docs").join(spark.table("b_embs"), "doc_id")
      assert(shuffles(bucketed.queryExecution.executedPlan) === 0,
        "bucketed join must not shuffle either side")
      assert(bucketed.count() === 2000)
      val unbucketed = docs.join(embs, "doc_id")
      assert(shuffles(unbucketed.queryExecution.executedPlan) === 2,
        "the unbucketed twin pays an exchange per side")
      assert(unbucketed.count() === 2000)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_embs")
    }
  }
}
