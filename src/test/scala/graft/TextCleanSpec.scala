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

  test("NFKC goldens: compatibility folds and composition (F9)") {
    val norm = (s: String) => Seq(Tuple1(s)).toDF("t")
      .select(normalizeUnicode($"t").as("c")).head().getString(0)
    assert(norm("ﬁsh") === "fish")          // ﬁ ligature → fi
    assert(norm("ＡBC") === "ABC")           // fullwidth Ａ → A
    assert(norm("①") === "1")               // circled one → 1
    assert(norm("é") === "é")         // e + combining acute → é
    assert(norm("café") === "café")    // composed stays composed
    assert(norm("plain ascii!") === "plain ascii!") // fast path: untouched
    assert(norm(null) === null)
  }

  test("NFKC folds flow through the full chain (after mojibake repair)") {
    // fullwidth letters + ligature survive into the cleaned output as ASCII
    assert(clean("Ｔhe ﬁle won't load") === "The file will not load")
    // mojibake repair still works even though â€™ ends in ™ (which NFKC
    // would fold to TM if it ran first)
    assert(clean("Itâ€™s ﬁne") === "It's fine")
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
