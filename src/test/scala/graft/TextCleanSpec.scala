package graft

import graft.functions.TextClean._
import org.scalatest.funsuite.AnyFunSuite

class TextCleanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clean(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(cleanText($"t").as("c")).head().getString(0)

  test("whitespace collapse preserves paragraph structure") {
    assert(clean("a   b\t\tc") === "a b c")
    assert(clean("p1\n\n\n\n\np2") === "p1\n\np2")
    assert(clean("  line \n  indented  ") === "line\nindented")
  }

  test("punctuation spacing (day_10 fix_punctuation)") {
    assert(clean("stop .and go") === "stop. and go")
    assert(clean("a,b") === "a, b")
    assert(clean("end.") === "end.")
  }

  test("contraction expansion, case-insensitive") {
    assert(clean("we won't can't I'm") === "we will not cannot I am")
    assert(clean("WON'T") === "will not")
  }

  test("mojibake fixes") {
    assert(clean("Itâ€™s here") === "It's here")
  }

  test("full chain is idempotent on clean text") {
    val once = clean("the quick brown fox. and the dog")
    assert(clean(once) === once)
  }

  test("special-char strip keeps basic punctuation") {
    val s = Seq(Tuple1("a†b*c.")).toDF("t")
      .select(stripSpecial($"t").as("c")).head().getString(0)
    assert(s === "abc.")
  }
}
