package graft

import graft.operators.{Decontaminate, Mixing, Packing, SkewJoin}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generator-based invariants for the curation operators — properties a
  * correct implementation cannot violate on ANY input, checked over
  * deterministic ScalaCheck batches (the VectorPropertiesSpec pattern). */
class CurationPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gen[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("packing partitions every input exactly once, within budget (random corpora)") {
    val wordsGen = Gen.listOfN(120, Gen.choose(0, 60))
    for (trial <- 0 until 5) {
      val counts = gen(wordsGen, 10L + trial)
      val budget = gen(Gen.choose(20, 90), 100L + trial)
      val docs = counts.zipWithIndex
        .map { case (nw, i) => (i.toLong, Seq.fill(nw)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val packed = Packing.packGreedy(docs, "doc_id", "text", budget, bucketSize = 16)
        .collect()
      // exactly-once cover
      assert(packed.map(_.doc_id).sorted.toSeq === (0L until 120L))
      packed.groupBy(p => (p.bucket, p.seq_index)).foreach { case ((b, _), members) =>
        val inOrder = members.sortBy(_.doc_id)
        // acc is the running sum of its members
        assert(inOrder.map(_.n_words).scanLeft(0)(_ + _).tail.toSeq ===
          inOrder.map(_.acc_words).toSeq, s"trial $trial bucket $b")
        // a sequence only exceeds the budget when flagged oversize
        if (inOrder.last.acc_words > budget)
          assert(inOrder.exists(_.oversize), s"trial $trial bucket $b over budget unflagged")
        // every doc stays in its id bucket
        inOrder.foreach(p => assert(p.doc_id / 16 === b))
      }
      // seq indices are contiguous from 0 within each bucket
      packed.groupBy(_.bucket).foreach { case (b, members) =>
        val seqs = members.map(_.seq_index).distinct.sorted
        assert(seqs.toSeq === (0 until seqs.length), s"trial $trial bucket $b seqs $seqs")
      }
    }
  }

  test("mixing keep-sets NEST as weight grows (monotonicity) and stay deterministic") {
    val docs = (0L until 800L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val keptAt = Seq(0.2, 0.5, 0.8, 1.0).map { w =>
      w -> Mixing.weightedSample(docs, "doc_id", lit(w))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    keptAt.sliding(2).foreach { case Seq((w1, s1), (w2, s2)) =>
      assert(s1.subsetOf(s2), s"keep set at $w1 must nest inside $w2's")
    }
    assert(keptAt.last._2.size === 800, "weight 1.0 keeps everything")
    // the decision is a pure function of the id: rerun is identical
    val again = Mixing.weightedSample(docs, "doc_id", lit(0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === keptAt(1)._2)
  }

  test("decontaminate and contaminated partition the training set (random text)") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon")
    val textGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val docs = (0 until 60)
      .map(i => (i.toLong, gen(textGen, 500L + i))).toDF("doc_id", "text")
    val bench = docs.where(col("doc_id") < 10)
    val train = docs.where(col("doc_id") >= 10)
    val flagged = Decontaminate.contaminated(train, bench, "doc_id", "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = Decontaminate.decontaminate(train, bench, "doc_id", "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = train.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((flagged intersect kept).isEmpty)
    assert((flagged union kept) === all, "every training doc is flagged or kept")
    // self-decontamination removes exactly the docs that have any n-gram
    val selfKept = Decontaminate.decontaminate(docs, docs, "doc_id", "text", n = 3)
      .select("doc_id", "text").collect()
    selfKept.foreach { r =>
      assert(r.getString(1).split("\\s+").count(_.nonEmpty) < 3,
        s"doc ${r.getLong(0)} shares grams with itself and must be removed")
    }
  }

  test("salted join equals plain join for random key distributions and salt counts") {
    val keyGen = Gen.frequency(6 -> Gen.const(3L), 4 -> Gen.choose(0L, 20L))
    for (trial <- 0 until 3) {
      val keys = (0 until 400).map(i => gen(keyGen, 900L + trial * 1000 + i))
      val big = keys.zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "payload")
      val small = (0L until 21L).map(k => (k, s"dim $k")).toDF("key", "attr")
      val salts = gen(Gen.choose(1, 12), 999L + trial)
      val a = SkewJoin.saltedJoin(big, small, "key", salts)
        .select("key", "payload", "attr").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      val b = big.join(small, "key").select("key", "payload", "attr").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      assert(a === b, s"trial $trial salts=$salts")
    }
  }
}
