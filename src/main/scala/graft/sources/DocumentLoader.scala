package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * File → document loaders (SURVEY §2.1 S9–S14, mirroring
 * day_10/utils/text_processor.py:200-364's extension-dispatched loader and
 * directory batch loader).
 *
 * Whole-file semantics use `binaryFile` (a real DataSource with path
 * pushdown via pathGlobFilter) rather than driver-side listing, so a
 * 100 TB document lake loads as ordinary partitioned scans.
 */
object DocumentLoader {

  /** Whole text files under a directory (S9/S14): (path, text, length). */
  def loadTextDir(spark: SparkSession, dir: String,
                  glob: String = "*.txt"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"),
        decode(col("content"), "UTF-8").as("text"),
        col("length"))

  /** Line-oriented text with file provenance (the `spark.read.text` form). */
  def loadTextLines(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir)
      .withColumn("path", input_file_name())
      .select(col("path"), col("value").as("text"))

  /** JSON documents rendered back to readable text (S10: json → pretty
    * text). One row per JSON record; `text` is the canonical JSON form. */
  def loadJsonAsText(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.json(path)
    df.select(to_json(struct(df.columns.map(col): _*)).as("text"))
      .withColumn("path", lit(path))
  }

  /** CSV rendered to readable text, first `maxRows` rows per file (S11:
    * day_10 caps at 100 rows): "col=value, col=value" lines. */
  def loadCsvAsText(spark: SparkSession, path: String,
                    maxRows: Int = 100): DataFrame = {
    val df = spark.read.option("header", "true").csv(path).limit(maxRows)
    val rendered = df.select(
      concat_ws(", ", df.columns.map(c => concat(lit(s"$c="), col(c))): _*).as("text"))
    rendered.withColumn("path", lit(path))
  }

  /** Pluggable binary-document text extraction (S12/S13 PDF/DOCX seam). */
  trait BinaryTextExtractor extends Serializable {
    def extract(path: String, bytes: Array[Byte]): String
  }

  /**
   * Fallback extractor for unrecognized binary formats: deterministically
   * recovers printable-ASCII runs (≥4 chars). PDF and DOCX get REAL
   * parsers — see [[BinaryText.PdfTextExtractor]] /
   * [[BinaryText.DocxTextExtractor]] (pure-JVM zip+StAX / content-stream
   * readers; no PDFBox/POI in the container).
   */
  object PrintableAsciiExtractor extends BinaryTextExtractor {
    def extract(path: String, bytes: Array[Byte]): String = {
      if (bytes == null) return ""
      val sb = new StringBuilder
      val run = new StringBuilder
      def flush(): Unit = {
        if (run.length >= 4) { sb.append(run).append(' ') }
        run.clear()
      }
      bytes.foreach { b =>
        val c = b.toChar
        if (c >= ' ' && c <= '~') run.append(c) else flush()
      }
      flush()
      sb.toString.trim
    }
  }

  /** Binary documents (pdf/docx/...) → text via the extractor, as a batched
    * mapPartitions over the binaryFile source (S12/S13). The default
    * routes by extension: real PDF/DOCX parsers, ASCII fallback otherwise. */
  def loadBinaryDocs(spark: SparkSession, dir: String, glob: String,
                     extractor: BinaryTextExtractor = BinaryText.ExtensionDispatchExtractor): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, bytes) => (p, extractor.extract(p, bytes)) })
      .toDF("path", "text")
  }
}
