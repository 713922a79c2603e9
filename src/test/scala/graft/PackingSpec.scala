package graft

import graft.operators.Packing
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def doc(n: Int): String = Array.fill(n)("w").mkString(" ")

  test("greedy fill, reset on overflow, oversize flag — hand-computed") {
    import spark.implicits._
    // budget 10, one bucket: 4 + 5 fits (9); 3 overflows -> seq 1;
    // 12 is oversize -> its own seq 2; 2 starts seq 3 after it
    val rows = Seq(
      (0L, doc(4)), (1L, doc(5)), (2L, doc(3)), (3L, doc(12)), (4L, doc(2)))
      .toDF("doc_id", "text")
    val packed = Packing.packGreedy(rows, "doc_id", "text",
        budgetWords = 10, bucketSize = 16)
      .collect().sortBy(_.doc_id)
    assert(packed.map(p => (p.doc_id, p.seq_index, p.acc_words, p.oversize)).toSeq === Seq(
      (0L, 0, 4, false), (1L, 0, 9, false), (2L, 1, 3, false),
      (3L, 2, 12, true), (4L, 3, 2, false)))
  }

  test("buckets pack independently and in parallel") {
    import spark.implicits._
    // bucketSize 2: ids {0,1} and {2,3} are separate buckets — doc 2
    // starts fresh even though doc 1 left room
    val rows = Seq((0L, doc(3)), (1L, doc(3)), (2L, doc(1)), (3L, doc(1)))
      .toDF("doc_id", "text")
    val packed = Packing.packGreedy(rows, "doc_id", "text",
        budgetWords = 100, bucketSize = 2)
      .collect().sortBy(_.doc_id)
    assert(packed.map(p => (p.bucket, p.seq_index, p.acc_words)).toSeq === Seq(
      (0L, 0, 3), (0L, 0, 6), (1L, 0, 1), (1L, 0, 2)))
  }

  test("sequence-level view: counts, totals, fill ratio") {
    import spark.implicits._
    val rows = Seq((0L, doc(4)), (1L, doc(5)), (2L, doc(3))).toDF("doc_id", "text")
    val packed = Packing.packGreedy(rows, "doc_id", "text",
      budgetWords = 10, bucketSize = 16)
    val seqs = Packing.packedSequences(packed, budgetWords = 10)
      .collect().map(r => (r.getAs[Int]("seq_index"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("total_words"),
        r.getAs[Double]("fill_ratio"))).sortBy(_._1)
    assert(seqs.toSeq === Seq((0, 2L, 9L, 0.9), (1, 1L, 3L, 0.3)))
  }

  test("packing covers every input document exactly once") {
    import spark.implicits._
    val rows = (0L until 100L).map(i => (i, doc((i % 17 + 1).toInt))).toDF("doc_id", "text")
    val packed = Packing.packGreedy(rows, "doc_id", "text",
      budgetWords = 30, bucketSize = 16).collect()
    assert(packed.map(_.doc_id).sorted.toSeq === (0L until 100L))
    // within every (bucket, seq), acc is the running sum of its members
    packed.groupBy(p => (p.bucket, p.seq_index)).foreach { case (_, members) =>
      val inOrder = members.sortBy(_.doc_id)
      assert(inOrder.map(_.n_words).scanLeft(0)(_ + _).tail.toSeq ===
        inOrder.map(_.acc_words).toSeq)
      // no non-oversize sequence exceeds the budget
      if (!inOrder.exists(_.oversize)) assert(inOrder.last.acc_words <= 30)
    }
  }
}
