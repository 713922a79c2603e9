package graft

import graft.operators.{Components, Dedup, SimilarityJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Clustered gaussians + planted near-copies: ids ≥ 100000 are scaled
    * copies of base ids (same direction ⇒ cosine 1.0 with their base). */
  private def planted(n: Int, dim: Int, copies: Int): org.apache.spark.sql.DataFrame = {
    val base = ClusteredFixture.corpus(spark, n, dim).map { case (id, v) => (id, v) }
    val dups = spark.sparkContext.parallelize(0 until copies, 2).map { i =>
      val srcId = (i * 7 % n).toLong
      val ctr = {
        val centers = Array.tabulate(20) { c =>
          val r = new java.util.Random(42L + c)
          Array.fill(dim)(r.nextGaussian() * 5.0)
        }
        centers((srcId % 20).toInt)
      }
      val r = new java.util.Random(1000L + srcId)
      val v = Array.tabulate(dim)(j => (ctr(j) + r.nextGaussian()).toFloat)
      (100000L + i, v.map(x => x * 1.5f)) // same direction, scaled
    }
    (base union dups).toDF("id", "vec")
  }

  test("k=1 semantic dedup equals exact component dedup") {
    val df = planted(300, 16, 40)
    val exactPairs = SimilarityJoin.thresholdPairs(df, "id", "vec", 0.9)
    val exactKept = Components.dropByPairs(df, "id", exactPairs)
      .select(col("id")).as[Long].collect().toSet
    val semKept = Dedup.semanticDedup(df, "id", "vec", 0.9, k = 1)
      .select(col("id")).as[Long].collect().toSet
    assert(semKept === exactKept)
  }

  test("planted exact-direction copies are pruned; marks partition the corpus") {
    val df = planted(300, 16, 40)
    val marks = Dedup.semanticDedupMarks(df, "id", "vec", threshold = 0.999, k = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(marks.length === 340) // one row per input id
    val kept = marks.filter(_._4).map(_._1).toSet
    // every planted copy has cosine ~1.0 with its base; a copy and its
    // base always share the nearest centroid (same direction), so each
    // (base, copy) pair must lose one member
    val copies = marks.filter(_._1 >= 100000L)
    assert(copies.nonEmpty)
    copies.foreach { case (id, _, canonical, keptFlag) =>
      val srcId = ((id - 100000L) * 7 % 300)
      assert(!keptFlag, s"copy $id of $srcId should be dropped (canonical=$canonical)")
      assert(canonical <= srcId, s"canonical $canonical must be ≤ base id $srcId")
    }
    // canonical is the component min: canonical ids are themselves kept
    val canonSet = marks.map(_._3).toSet
    assert(canonSet.subsetOf(kept))
  }

  test("approximation contract: dropped ids always have an exact global θ-witness") {
    val df = planted(400, 16, 60)
    val theta = 0.95
    val marks = Dedup.semanticDedupMarks(df, "id", "vec", theta, k = 8)
    val dropped = marks.where(!col("kept")).select(col("id")).as[Long].collect().toSet
    val pairNodes = SimilarityJoin.thresholdPairs(df, "id", "vec", theta)
      .select(col("id_a")).union(
        SimilarityJoin.thresholdPairs(df, "id", "vec", theta).select(col("id_b")))
      .as[Long].collect().toSet
    assert(dropped.subsetOf(pairNodes),
      s"dropped without witness: ${dropped.diff(pairNodes).take(5)}")
  }

  test("keepFarthest selects the centroid-farthest member (the paper's rule)") {
    val df = planted(300, 16, 40)
    val theta = 0.999
    val defMarks = Dedup.semanticDedupMarks(df, "id", "vec", theta, k = 6)
    val farMarks = Dedup.semanticDedupMarks(df, "id", "vec", theta, k = 6,
      keepFarthest = true)
    // same clusters, same partition into groups — only the representative
    // changes; planted copies are scaled ×1.5 so they are FARTHER from
    // any centroid than their base: with keepFarthest the copy wins
    val defKept = defMarks.where(col("kept")).select(col("id")).as[Long].collect().toSet
    val farKept = farMarks.where(col("kept")).select(col("id")).as[Long].collect().toSet
    assert(defKept.size === farKept.size) // same number of components survive
    val copies = farMarks.where(col("id") >= 100000L)
      .select(col("id"), col("kept")).as[(Long, Boolean)].collect()
    assert(copies.nonEmpty)
    copies.foreach { case (id, kept) =>
      assert(kept, s"scaled copy $id should be the farthest-from-centroid representative")
    }
    // and the default rule keeps the (smaller-id) base instead
    assert(defKept.intersect(copies.map(_._1).toSet).isEmpty)
  }

  test("scrub with runStripN catches cross-line boilerplate the line strip misses") {
    import graft.operators.CurationPipeline
    // the shared run spans a line break: "tail one\ntwo three four" —
    // neither LINE recurs wholly (prefix differs), but the token run does
    val docs = Seq(
      (1L, "src", "alpha unique line\nmid one two three four five end1"),
      (2L, "src", "beta other line\nmid one two three four five end2"),
      (3L, "src", "gamma standalone content without any shared runs")
    ).toDF("doc_id", "source", "text")
    val noStrip = CurationPipeline.scrub(docs, "doc_id", "text", Seq("zzznope"),
      lineMinDocs = 2)
    val withStrip = CurationPipeline.scrub(docs, "doc_id", "text", Seq("zzznope"),
      lineMinDocs = 2, runStripN = 6)
    val before = noStrip.where(col("doc_id") === 1L).select(col("text")).as[String].head()
    val after = withStrip.where(col("doc_id") === 1L).select(col("text")).as[String].head()
    assert(before.contains("one two three four five"))
    assert(!after.contains("one two three four five"),
      s"cross-line run not stripped: '$after'")
    assert(after.contains("alpha") && after.contains("end1"))
    val untouched = withStrip.where(col("doc_id") === 3L).select(col("text")).as[String].head()
    assert(untouched.contains("gamma standalone content"))
  }

  test("groupedThresholdPairs equals per-group filtering of the exact scan") {
    val df = planted(200, 8, 30)
      .withColumn("grp", (col("id") % 3).cast("int"))
    val got = SimilarityJoin.groupedThresholdPairs(df, "grp", "id", "vec", 0.8)
      .select(col("grp"), col("id_a"), col("id_b"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val want = SimilarityJoin.thresholdPairs(df, "id", "vec", 0.8)
      .join(df.select(col("id").as("id_a"), col("grp").as("ga")), "id_a")
      .join(df.select(col("id").as("id_b"), col("grp").as("gb")), "id_b")
      .where(col("ga") === col("gb"))
      .select(col("ga"), col("id_a"), col("id_b"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("null groups survive the grouped grid: keyed, scanned, and restored as null") {
    // nulls must neither NPE the sort-based cell ordering nor be
    // silently dropped by the group restore join — a null group is one
    // more group, paired within itself only
    val df = planted(60, 8, 10)
      .withColumn("grp", when(col("id") % 2 === 0, lit("even")).otherwise(lit(null)))
    for (fn <- Seq(
        () => SimilarityJoin.groupedThresholdPairs(df, "grp", "id", "vec", 0.8)
          .select(col("grp"), col("id_a"), col("id_b")),
        () => SimilarityJoin.groupedTopPairs(df, "grp", "id", "vec", k = 5)
          .select(col("grp"), col("id_a"), col("id_b")))) {
      val rows = fn().collect()
      assert(rows.nonEmpty)
      val nullRows = rows.filter(_.isNullAt(0))
      assert(nullRows.nonEmpty, "the null group's own pairs must be emitted")
      // every pair in the null group is odd×odd (the null members)
      nullRows.foreach(r =>
        assert(r.getLong(1) % 2 != 0 && r.getLong(2) % 2 != 0, r.toString))
    }
    // delta form: a null-group delta member pairs against null-group
    // archived members and the group round-trips as null
    val asg = df.select(col("grp"), col("id"), col("vec").as("v"))
    val oldSide = asg.where(col("id") < 100000L)
    val newSide = asg.where(col("id") >= 100000L)
    val delta = SimilarityJoin.groupedThresholdPairsDelta(
      oldSide, newSide, "grp", "id", "v", 0.8)
    val dNull = delta.where(col("grp").isNull).count()
    val dAll = delta.count()
    assert(dAll > 0)
    assert(dNull > 0, "null-group delta pairs must survive the restore join")
  }
}
