package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The composed training-data curation DAG — the reason the individual
 * operators exist, wired in the order a production pipeline runs them:
 *
 *   quality filters → exact dedup → benchmark decontamination →
 *   dataset mixing → sequence packing
 *
 * (Quality first: it is the cheapest per-row test and shrinks every
 * later stage. Dedup before decontamination so duplicate documents
 * don't multiply the gram join. Mixing after decontamination so
 * sampling weights apply to the CLEAN pool. Packing last — it consumes
 * the final membership.)
 *
 * Every stage is deterministic, so the whole DAG is reproducible and
 * oracle-checkable end to end (q64). Each stage keeps the input's full
 * row (semi/anti joins on the id), so downstream stages can use any
 * column — mixing reads the source column that survived four stages.
 */
object CurationPipeline {

  /** Per-stage attrition report: `(stage_index, stage, n)` — document
    * counts after each stage, then the packed-sequence count. One Spark
    * action over a union of count aggregates (not driver-side counts). */
  def report(train: DataFrame, benchmark: DataFrame,
             idCol: String, textCol: String, mixWeight: Column,
             decontamN: Int = 3, budgetWords: Int = 120,
             bucketSize: Int = 16): DataFrame = {
    val q = QualityFilters.keepDocuments(train, idCol, textCol)
    val d = Dedup.dropExactDuplicates(q, idCol, textCol)
    val dec = Decontaminate.decontaminate(d, benchmark, idCol, textCol, decontamN)
    val mix = Mixing.weightedSample(dec, idCol, mixWeight)
    val seqs = Packing.packGreedy(mix, idCol, textCol, budgetWords, bucketSize)
      .toDF().select(col("bucket"), col("seq_index")).distinct()
    val stages = Seq(
      (0, "input", train), (1, "quality", q), (2, "exact_dedup", d),
      (3, "decontaminated", dec), (4, "mixed", mix),
      (5, "packed_sequences", seqs))
    stages.map { case (i, name, df) =>
      df.agg(count(lit(1)).as("n"))
        .select(lit(i).as("stage_index"), lit(name).as("stage"), col("n"))
    }.reduce(_ unionByName _)
  }

  /** The curated corpus itself (everything the report counts at stage 4,
    * with its packed sequence assignment attached). */
  def curate(train: DataFrame, benchmark: DataFrame,
             idCol: String, textCol: String, mixWeight: Column,
             decontamN: Int = 3, budgetWords: Int = 120,
             bucketSize: Int = 16): DataFrame = {
    val q = QualityFilters.keepDocuments(train, idCol, textCol)
    val d = Dedup.dropExactDuplicates(q, idCol, textCol)
    val dec = Decontaminate.decontaminate(d, benchmark, idCol, textCol, decontamN)
    val mix = Mixing.weightedSample(dec, idCol, mixWeight)
    val packed = Packing.packGreedy(mix, idCol, textCol, budgetWords, bucketSize)
      .toDF().withColumnRenamed("doc_id", "__pid")
    mix.join(packed, col(idCol) === col("__pid")).drop("__pid")
  }
}
