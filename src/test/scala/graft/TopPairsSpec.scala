package graft

import graft.Tables
import graft.operators.SimilarityJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The blocked bounded-heap top-pairs operator must be BIT-IDENTICAL to
  * the exact theta-join form it replaces (same cosine arithmetic, same
  * (sim desc, id_a, id_b) tie order) — the DuckDB oracle for q14/q38 is
  * the theta-join's answer, so any drift here is a correctness failure,
  * not an approximation. */
class TopPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def embeddings = Tables(spark, TestSpark.sfDir, "embeddings")

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.select("id_a", "id_b", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("blocked topPairs matches the exact theta-join bit-for-bit") {
    val viaJoin = collectPairs(
      SimilarityJoin.topPairsJoin(embeddings, "vec_id", "embedding", 20))
    val blocked = collectPairs(
      SimilarityJoin.topPairs(embeddings, "vec_id", "embedding", 20))
    assert(blocked === viaJoin)
  }

  test("forced multi-block grid (blockRows=64) is still exact") {
    val viaJoin = collectPairs(
      SimilarityJoin.topPairsJoin(embeddings, "vec_id", "embedding", 25))
    val blocked = collectPairs(
      SimilarityJoin.topPairs(embeddings, "vec_id", "embedding", 25, blockRows = 64))
    assert(blocked === viaJoin)
  }

  test("groupedTopPairs matches the window-over-theta-join, label type preserved") {
    val e = embeddings
    val expected = {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFunctions.cosineSimilarity
      val pairs = e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.label").as("label"),
          col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          cosineSimilarity(col("a.embedding"), col("b.embedding")).as("sim"))
      val w = Window.partitionBy(col("label"))
        .orderBy(col("sim").desc, col("id_a"), col("id_b"))
      pairs.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select("label", "rn", "id_a", "id_b", "sim")
        .orderBy("label", "rn")
    }
    val got = SimilarityJoin.groupedTopPairs(e, "label", "vec_id", "embedding", 3)
      .orderBy("label", "rn")
    assert(got.schema("label").dataType === expected.schema("label").dataType)
    val gotRows = got.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    val expRows = expected.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(gotRows === expRows)
  }

  test("grouped with forced blocking handles a hot group exactly") {
    val e = embeddings
    val expected = SimilarityJoin.groupedTopPairs(e, "label", "vec_id", "embedding", 3)
      .orderBy("label", "rn").collect().toSeq
    val forced = SimilarityJoin.groupedTopPairs(e, "label", "vec_id", "embedding", 3,
        blockRows = 8)
      .orderBy("label", "rn").collect().toSeq
    assert(forced === expected)
  }

  test("ties (duplicate vectors) resolve by (id_a, id_b) like the join form") {
    val v = Array(1.0f, 2.0f, 3.0f)
    val u = Array(-3.0f, 1.0f, 0.5f)
    val df = Seq((10L, v), (3L, v), (7L, v), (1L, u), (2L, u))
      .toDF("vec_id", "embedding")
    val viaJoin = collectPairs(SimilarityJoin.topPairsJoin(df, "vec_id", "embedding", 4))
    val blocked = collectPairs(SimilarityJoin.topPairs(df, "vec_id", "embedding", 4, blockRows = 2))
    assert(blocked === viaJoin)
    // duplicate-vector pairs score exactly 1.0 and rank by (id_a, id_b) —
    // both the v-clones and the u-clones tie at 1.0
    assert(blocked.map(p => (p._1, p._2)) === Seq((1L, 2L), (3L, 7L), (3L, 10L), (7L, 10L)))
    assert(blocked.forall(_._3 === 1.0))
  }

  test("ragged lengths and null/zero vectors follow the Catalyst expression") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f, 1.0f)),
      (2L, Array(1.0f, 0.0f)), // ragged: min-length semantics
      (3L, null.asInstanceOf[Array[Float]]), // null: no pairs
      (4L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero norm → sim 0.0
      (5L, Array(0.5f, -1.0f, 1.5f, 2.0f))
    ).toDF("vec_id", "embedding")
    // the theta-join drops null-vector pairs via null sims ordered last;
    // compare against it restricted to non-null sims
    val viaJoin = collectPairs(
      SimilarityJoin.allPairs(df, "vec_id", "embedding")
        .where(col("sim").isNotNull)
        .orderBy(col("sim").desc, col("id_a"), col("id_b")).limit(6))
    val blocked = collectPairs(SimilarityJoin.topPairs(df, "vec_id", "embedding", 6))
    assert(blocked === viaJoin)
    assert(!blocked.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("property: blocked == theta-join over random corpora (sizes, dims, duplicates)") {
    // randomized corpora stress tie order, block-boundary cases, and the
    // Cauchy–Schwarz prune margin; deterministic seeds so failures replay
    val rng = new scala.util.Random(0xC0FFEE)
    (0 until 6).foreach { trial =>
      val n = 5 + rng.nextInt(60)
      val d = 2 + rng.nextInt(12)
      val dupEvery = 2 + rng.nextInt(4)
      val rows = (0 until n).map { i =>
        val v =
          if (i % dupEvery == 0 && i > 0) // seeded duplicates force 1.0-ties
            Array.fill(d)(((i / dupEvery) % 3).toFloat + 0.5f)
          else Array.fill(d)((rng.nextGaussian() * 2).toFloat)
        (i.toLong, v)
      }
      val df = rows.toDF("vec_id", "embedding")
      val k = 1 + rng.nextInt(12)
      val blockRows = 1 + rng.nextInt(16)
      val expect = collectPairs(SimilarityJoin.topPairsJoin(df, "vec_id", "embedding", k))
      val got = collectPairs(SimilarityJoin.topPairs(df, "vec_id", "embedding", k, blockRows))
      assert(got === expect,
        s"trial=$trial n=$n d=$d k=$k blockRows=$blockRows dupEvery=$dupEvery")
    }
  }

  test("thresholdPairs equals the filtered theta-join, including forced blocking") {
    val e = embeddings
    val expect = SimilarityJoin.allPairs(e, "vec_id", "embedding")
      .where(col("sim") >= 0.4)
      .select("id_a", "id_b", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = SimilarityJoin.thresholdPairs(e, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expect)
    val blocked = SimilarityJoin.thresholdPairs(e, "vec_id", "embedding", 0.4, blockRows = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked === expect)
    assert(expect.nonEmpty)
  }

  test("k larger than the pair count returns every pair; empty input returns none") {
    val df = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(2.0f, 1.0f))).toDF("vec_id", "embedding")
    assert(SimilarityJoin.topPairs(df, "vec_id", "embedding", 50).count() === 1L)
    val empty = df.where(col("vec_id") < 0)
    assert(SimilarityJoin.topPairs(empty, "vec_id", "embedding", 5).count() === 0L)
  }
}
