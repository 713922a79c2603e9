package graft

import graft.sources.DocumentLoader
import org.scalatest.funsuite.AnyFunSuite

class DocumentLoaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(): java.io.File =
    java.nio.file.Files.createTempDirectory("docs").toFile

  private def writeFile(dir: java.io.File, name: String, content: String): Unit = {
    val w = new java.io.PrintWriter(new java.io.File(dir, name))
    w.print(content); w.close()
  }

  test("whole-text directory loader with glob filter and recursion") {
    val dir = tmpDir()
    writeFile(dir, "a.txt", "alpha document")
    writeFile(dir, "b.md", "markdown ignored")
    val sub = new java.io.File(dir, "sub"); sub.mkdir()
    writeFile(sub, "c.txt", "nested document")
    val df = DocumentLoader.loadTextDir(spark, dir.getAbsolutePath)
    val texts = df.collect().map(_.getAs[String]("text")).toSet
    assert(texts === Set("alpha document", "nested document"))
  }

  test("json loader renders records as text") {
    val dir = tmpDir()
    writeFile(dir, "d.json", """{"title":"t1","body":"b1"}""" + "\n" + """{"title":"t2","body":"b2"}""")
    val df = DocumentLoader.loadJsonAsText(spark, dir.getAbsolutePath + "/d.json")
    assert(df.count() === 2)
    assert(df.head().getAs[String]("text").contains("\"title\""))
  }

  test("csv loader renders col=value text, capped rows (day_10 cap)") {
    val dir = tmpDir()
    val rows = (1 to 150).map(i => s"r$i,$i").mkString("\n")
    writeFile(dir, "t.csv", "name,score\n" + rows)
    val df = DocumentLoader.loadCsvAsText(spark, dir.getAbsolutePath + "/t.csv", maxRows = 100)
    assert(df.count() === 100)
    assert(df.head().getAs[String]("text").matches("name=r\\d+, score=\\d+"))
  }

  test("binary loader extracts printable text through the stub extractor") {
    val dir = tmpDir()
    val bytes = Array[Byte](0, 1, 2) ++ "Hello PDF world".getBytes ++ Array[Byte](-1, -2) ++ "tail".getBytes
    java.nio.file.Files.write(new java.io.File(dir, "x.pdf").toPath, bytes)
    val df = DocumentLoader.loadBinaryDocs(spark, dir.getAbsolutePath, "*.pdf")
    val text = df.head().getAs[String]("text")
    assert(text.contains("Hello PDF world"))
    assert(text.contains("tail"))
  }
}
