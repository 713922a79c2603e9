package graft

import graft.functions.{TextExpressions, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hash(s: String): Long =
    Seq(Tuple1(s)).toDF("t")
      .select(TextFunctions.rollingFingerprint($"t").as("h"))
      .head().getLong(0)

  test("rolling hash golden: polynomial base-31 mod 1e9+7 over codepoints") {
    // ((0*31+97)*31+98)*31+99 mod p — same arithmetic the DuckDB oracle runs
    assert(hash("abc") === ((97L * 31 + 98) * 31 + 99) % 1000000007L)
    assert(hash("") === 0L)
  }

  test("rolling hash iterates codepoints, not UTF-16 units") {
    // U+1F600 is a surrogate pair in UTF-16 but ONE codepoint (128512):
    // parity with DuckDB's string_split(s,'') + unicode() demands one step
    val cp = 128512L
    assert(hash("😀") === cp % 1000000007L)
    assert(hash("😀a") === (cp * 31 + 'a'.toLong) % 1000000007L)
  }

  test("null input yields null, not a crash") {
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(TextFunctions.rollingFingerprint($"t").as("h")).head()
    assert(r.isNullAt(0))
  }

  test("interpreted eval matches the codegen path") {
    import org.apache.spark.unsafe.types.UTF8String
    // the static kernel IS the interpreted path; compare against the
    // whole-stage-codegen'd query result on real corpus text
    val docs = Tables(spark, TestSpark.sfDir, "documents").limit(20)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val viaQuery = Tables(spark, TestSpark.sfDir, "documents").limit(20)
      .select($"doc_id", TextFunctions.rollingFingerprint($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, t) =>
      assert(viaQuery(id) === TextExpressions.rollingHash(UTF8String.fromString(t)))
    }
  }

  test("SQL registration: rolling_hash is callable from spark.sql") {
    graft.functions.TextFunctions.registerAll(spark)
    val r = spark.sql("SELECT rolling_hash('abc') AS h").head().getLong(0)
    assert(r === hash("abc"))
  }

  test("rejects non-string input at analysis time") {
    val ex = intercept[Exception] {
      Seq(Tuple1(1)).toDF("t")
        .select(TextFunctions.rollingFingerprint($"t")).head()
    }
    assert(ex.getMessage.toLowerCase.contains("string"))
  }
}
