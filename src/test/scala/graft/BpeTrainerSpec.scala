package graft

import graft.operators.BpeTrainer
import graft.operators.BpeTrainer.Merge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the classic Sennrich dictionary: low:5 lower:2 newest:6 widest:3
  private val dict = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learns the textbook merge sequence from the Sennrich dictionary") {
    val merges = BpeTrainer.learnFromDictionary(dict, 5)
    assert(merges === Seq(
      Merge("e", "s"), Merge("es", "t"), Merge("est", BpeTrainer.EndOfWord),
      Merge("l", "o"), Merge("lo", "w")))
  }

  test("corpus-learned merges equal dictionary-learned merges") {
    val corpus = dict.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq.toDF("id", "text")
    val learned = BpeTrainer.learnMerges(df, "text", 5)
    assert(learned === BpeTrainer.learnFromDictionary(dict, 5))
  }

  test("encode applies merges in rank order: lowest -> low + est</w>") {
    val merges = BpeTrainer.learnFromDictionary(dict, 5)
    val enc = BpeTrainer.encode(Seq((1L, "lowest"), (2L, "newest lower")).toDF("id", "text"),
        "id", "text", merges)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList, r.getLong(2)))
    assert(enc(0) === ((1L, List("low", "est</w>"), 2L)))
    // newest = n e w est</w> (4 tokens); lower = low e r </w> (4 tokens)
    assert(enc(1)._2 === List("n", "e", "w", "est</w>", "low", "e", "r", "</w>"))
    assert(enc(1)._3 === 8L)
  }

  test("training is deterministic and stops when nothing recurs") {
    val tiny = Array(("ab", 1L), ("cd", 1L))
    val merges = BpeTrainer.learnFromDictionary(tiny, 10)
    assert(merges.isEmpty) // every pair occurs once — no merge at min-count 2
    val again = BpeTrainer.learnFromDictionary(dict, 5)
    assert(again === BpeTrainer.learnFromDictionary(dict, 5))
  }

  test("real-corpus smoke: merges learn, encoding covers every word, counts consistent") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val merges = BpeTrainer.learnMerges(docs, "text", numMerges = 50)
    assert(merges.size === 50)
    val enc = BpeTrainer.encode(docs.limit(50), "doc_id", "text", merges)
    val rows = enc.select(col("n_tokens")).as[Long].collect()
    assert(rows.forall(_ > 0))
    // BPE token count is bounded below by word count (merges only shrink
    // within words, and every word emits >= 1 token)
    val words = docs.limit(50)
      .select(size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("w"))
      .as[Long].collect()
    assert(rows.sum >= words.length) // at least one token per doc trivially
  }

  test("rank-greedy encode reproduces the training segmentation on every dictionary word") {
    // the q82 oracle replays TRAINING segmentations while the Spark side
    // runs the production rank-greedy encoder — this corpus-wide parity
    // is what makes the two the same surface (classic BPE property:
    // applying merges lowest-rank-first re-derives the training result
    // on any word the trainer saw)
    // the synthetic documents corpus draws from a CLOSED ~31-word
    // vocabulary at every sf (generator design), so "corpus-wide" parity
    // is 31 words here — plus a hand-built open-vocab dictionary below
    // to cover shapes the generator can't produce
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val azDict = BpeTrainer.wordCounts(docs, "text")
      .where(col("word").rlike("^[a-z]+$"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val detailed = BpeTrainer.learnFromDictionaryDetailed(azDict, 12)
    val segs = BpeTrainer.trainedSegmentations(azDict, 12)
    val rank = detailed.map(_._1).zipWithIndex
      .map { case (m, i) => ((m.left, m.right), i) }.toMap
    azDict.zip(segs).foreach { case ((w, _), trained) =>
      val greedy = BpeTrainer.encodeWord(w, rank)
      assert(greedy.sameElements(trained),
        s"word '$w': greedy=${greedy.mkString("|")} trained=${trained.mkString("|")}")
    }
    assert(azDict.length >= 30) // the generator's full closed vocabulary

    // open-vocab adversarial dictionary: runs ("aaaa"), nested merges,
    // shared prefixes/suffixes — the boundary cases of greedy-vs-training
    val hard = Array(("aaaa", 50L), ("aaa", 40L), ("aa", 30L), ("abab", 25L),
      ("aabb", 20L), ("banana", 15L), ("bananas", 12L), ("nan", 10L),
      ("anan", 9L), ("abcabc", 8L), ("xyzzy", 7L), ("zzz", 6L))
    val hd = BpeTrainer.learnFromDictionaryDetailed(hard, 20)
    val hsegs = BpeTrainer.trainedSegmentations(hard, 20)
    val hrank = hd.map(_._1).zipWithIndex.map { case (m, i) => ((m.left, m.right), i) }.toMap
    hard.zip(hsegs).foreach { case ((w, _), trained) =>
      val greedy = BpeTrainer.encodeWord(w, hrank)
      assert(greedy.sameElements(trained),
        s"word '$w': greedy=${greedy.mkString("|")} trained=${trained.mkString("|")}")
    }
  }
}
