package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * CSV vector-table loader (S1–S3, day_2/noramalization.py:15-60): header
 * CSV, vector columns detected by the `dim_` prefix convention, rows with
 * any NaN/null vector component dropped, components assembled into one
 * `array<double>` column. Schema-on-read; the dim_* columns are pruned
 * after assembly so downstream plans carry a single vector column.
 */
object CsvVectorSource {

  val DimPrefix = "dim_"

  def load(spark: SparkSession, path: String,
           vectorCol: String = "vector"): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("nanValue", "NaN")
      .csv(path)
    val dimCols = raw.columns.filter(_.startsWith(DimPrefix))
      .sortBy(c => c.stripPrefix(DimPrefix).toInt)
    require(dimCols.nonEmpty, s"no $DimPrefix* columns in $path")
    val cleaned = raw
      .na.drop("any", dimCols)
      // NaN is not null: drop rows where any component is NaN too (S3)
      .where(dimCols.map(c => !isnan(col(c))).reduce(_ && _))
    cleaned
      .withColumn(vectorCol, array(dimCols.map(c => col(c).cast("double")): _*))
      .drop(dimCols: _*)
  }

  /** Missing-value report (the day_2 loader prints one — S1). */
  def missingReport(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    val checks = raw.columns.map(c =>
      sum(when(col(c).isNull || (col(c).cast("string") === "NaN"), 1).otherwise(0)).as(c))
    raw.agg(checks.head, checks.tail: _*)
  }
}
