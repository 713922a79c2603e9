package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * BPE tokenizer TRAINING — the pipeline stage every LLM corpus needs
 * before packing/token-budgeting, absent from the reference (which
 * consumes pre-trained tokenizers; its token counting is a regex
 * approximation, `TextFunctions.bpeTokens`).
 *
 * Regime (the standard one, as in Sennrich et al. 2016 and the
 * HuggingFace trainer): merge learning operates on the WORD-FREQUENCY
 * DICTIONARY, not the corpus — so the distributed part is exactly one
 * word-count aggregate (map-side combined, narrow key), the dictionary
 * is capped at `maxVocabWords` by frequency (driver state bounded at
 * ~100k (word, count) pairs — a few MB regardless of corpus size), and
 * the merge loop runs driver-side over symbol sequences whose total
 * length is the dictionary's character mass. 100 TB of text changes
 * the aggregate's cost, never the loop's.
 *
 * Determinism: ties on pair frequency break lexicographically on the
 * pair, and the dictionary cap breaks count ties by word — the learned
 * merge table is a pure function of the corpus.
 *
 * Encoding applies merges greedily in rank order per word (the
 * standard BPE apply), as a typed map with the broadcast rank table;
 * per-word results memoize per partition.
 */
object BpeTrainer {

  /** End-of-word marker (Sennrich-style suffix symbol). */
  val EndOfWord = "</w>"

  final case class Merge(left: String, right: String) {
    def joined: String = left + right
  }

  /** Lowercased \s+ word counts — the dictionary the trainer consumes. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /**
   * Learn `numMerges` BPE merges from the corpus. One distributed
   * aggregate; the loop is driver-local over the capped dictionary.
   */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
                  maxVocabWords: Int = 100000): Seq[Merge] = {
    val dict = wordCounts(df, textCol)
      .orderBy(col("n").desc, col("word"))
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    learnFromDictionary(dict, numMerges)
  }

  /** The driver-side trainer, exposed for spec fixtures. */
  def learnFromDictionary(dict: Array[(String, Long)], numMerges: Int): Seq[Merge] =
    learnFromDictionaryDetailed(dict, numMerges).map(_._1)

  /** [[learnFromDictionary]] with each merge's winning pair frequency —
    * the exact-integer surface the q81 oracle replays stage by stage
    * (the count is Σ word-freq over every adjacent occurrence, OVERLAPS
    * INCLUDED — Sennrich's `get_stats`; the merge application is a
    * single left-to-right non-overlapping pass — Sennrich's
    * `merge_vocab`. The asymmetry is the canonical algorithm's own). */
  def learnFromDictionaryDetailed(dict: Array[(String, Long)],
                                  numMerges: Int): Seq[(Merge, Long)] =
    trainCore(dict, numMerges)._1

  /** The dictionary's final segmentations under the learned table —
    * aligned with `dict` order. This is the training-time ground truth
    * the rank-greedy [[encode]] must reproduce on every dictionary word
    * (BpeTrainerSpec parity-gates the two; the q82 oracle replays THIS
    * surface stage by stage in SQL). */
  def trainedSegmentations(dict: Array[(String, Long)],
                           numMerges: Int): Array[Array[String]] =
    trainCore(dict, numMerges)._2

  private def trainCore(dict: Array[(String, Long)], numMerges: Int)
      : (Seq[(Merge, Long)], Array[Array[String]]) = {
    // each word as a mutable symbol sequence: chars + the end marker
    val words: Array[(Array[String], Long)] = dict.map { case (w, n) =>
      ((w.map(_.toString) :+ EndOfWord).toArray, n)
    }
    def segs: Array[Array[String]] = words.map(_._1)
    val merges = collection.mutable.ArrayBuffer.empty[(Merge, Long)]
    var iter = 0
    while (iter < numMerges) {
      // pair frequencies over the dictionary, weighted by word count
      val freq = collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          freq.update(k, freq.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (freq.isEmpty) return (merges.toSeq, segs)
      // max by count, ties lexicographic on the pair — deterministic
      val best = freq.maxBy { case ((a, b), n) => (n, a, b) }(
        Ordering.Tuple3(Ordering.Long, Ordering.String.reverse, Ordering.String.reverse))
      if (best._2 < 2) return (merges.toSeq, segs) // nothing recurs — stop early
      val (l, r) = best._1
      merges += ((Merge(l, r), best._2))
      // apply the merge in place
      var w = 0
      while (w < words.length) {
        val (syms, n) = words(w)
        if (syms.length > 1) {
          val out = collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          if (out.length != syms.length) words(w) = (out.toArray, n)
        }
        w += 1
      }
      iter += 1
    }
    (merges.toSeq, segs)
  }

  /** Encode one word (without marker handling by the caller). */
  private[graft] def encodeWord(w: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = (w.map(_.toString) :+ EndOfWord).toArray
    var done = false
    while (!done && syms.length > 1) {
      // lowest-rank applicable merge (standard BPE apply order)
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))) match {
          case Some(rk) if rk < bestRank => bestRank = rk; bestAt = i
          case _ => ()
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val out = new Array[String](syms.length - 1)
        var j = 0; var k = 0
        while (j < syms.length) {
          if (j == bestAt) { out(k) = syms(j) + syms(j + 1); j += 2 }
          else { out(k) = syms(j); j += 1 }
          k += 1
        }
        syms = if (k == out.length) out else java.util.Arrays.copyOf(out, k)
      }
    }
    syms
  }

  /** Corpus encoding under a learned merge table: (id, tokens, n_tokens).
    * Typed map, merges broadcast as a rank map, per-partition word memo
    * (capped — Zipf makes the hit rate high). */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rank: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (m, i) => ((m.left, m.right), i) }.toMap
    val bc = spark.sparkContext.broadcast(rank)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rk = bc.value
        val memo = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, t) =>
          val txt = if (t == null) "" else t.toLowerCase(java.util.Locale.ROOT).trim
          val out = collection.mutable.ArrayBuffer.empty[String]
          txt.split("\\s+").iterator.filter(_.nonEmpty).foreach { w =>
            var toks = memo.get(w)
            if (toks == null) {
              toks = encodeWord(w, rk)
              if (memo.size < (1 << 18)) memo.put(w, toks)
            }
            out ++= toks
          }
          (id, out.toArray, out.length.toLong)
        }
      }
      .toDF("doc_id", "tokens", "n_tokens")
  }
}
