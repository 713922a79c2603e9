package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Deterministic synthetic data generators (SURVEY §2.1 S18): seeded
 * clustered gaussian vectors (day_6/day6_complete.py:26-52 shape) and a
 * small knowledge-base document fixture (day_12/src/main.py:493-546 shape).
 * Everything is a function of (seed, id) — reproducible at any parallelism.
 */
object Fixtures {

  /** n vectors of `dim` dims in `nClusters` gaussian blobs (std 1 around
    * scale-5 centers), exactly the day_6 benchmark-data recipe. */
  def clusteredVectors(spark: SparkSession, n: Long, dim: Int,
                       nClusters: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val centers = Array.tabulate(nClusters) { c =>
      val r = new java.util.Random(seed + c)
      Array.fill(dim)(r.nextGaussian() * 5.0)
    }
    val bc = spark.sparkContext.broadcast(centers)
    spark.range(n).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val cluster = (id % bc.value.length).toInt
          val ctr = bc.value(cluster)
          val r = new java.util.Random(seed * 7919L + id)
          (id, Array.tabulate(dim)(i => (ctr(i) + r.nextGaussian()).toFloat), cluster)
        }
      }
      .toDF("vec_id", "embedding", "label")
  }

  /** The day_12 six-document knowledge base (topics preserved; text
    * paraphrased — fixture content, not behavior). */
  def knowledgeBase(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("ai_overview", "Artificial intelligence is the field of building systems that perform tasks requiring human-like intelligence.", "ai"),
      ("machine_learning", "Machine learning is a subset of AI in which models learn patterns from data instead of explicit rules.", "ml"),
      ("deep_learning", "Deep learning uses multi-layer neural networks to learn hierarchical representations.", "ml"),
      ("nlp_fundamentals", "Natural language processing enables computers to understand and generate human language.", "nlp"),
      ("computer_vision", "Computer vision extracts information from images and video.", "cv"),
      ("rag_systems", "Retrieval-augmented generation combines a retriever over a vector store with a generator model.", "rag"),
    ).toDF("document_id", "content", "topic")
  }
}
