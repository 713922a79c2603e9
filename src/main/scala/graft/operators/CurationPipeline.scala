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

  /** The staged DataFrames, built ONCE so [[report]] always audits the
    * exact pipeline [[curate]] emits — the two can never diverge. */
  private final case class Stages(quality: DataFrame, deduped: DataFrame,
                                  decontaminated: DataFrame, mixed: DataFrame)

  private def stages(train: DataFrame, benchmark: DataFrame,
                     idCol: String, textCol: String, mixWeight: Column,
                     decontamN: Int): Stages = {
    val q = QualityFilters.keepDocuments(train, idCol, textCol)
    val d = Dedup.dropExactDuplicates(q, idCol, textCol)
    val dec = Decontaminate.decontaminate(d, benchmark, idCol, textCol, decontamN)
    Stages(q, d, dec, Mixing.weightedSample(dec, idCol, mixWeight))
  }

  /** Per-stage attrition report: `(stage_index, stage, n)` — document
    * counts after each stage, then the packed-sequence count. The two
    * expensive stage prefixes (dedup's fingerprint window, the
    * decontamination gram join) are cached while counting so each stage
    * computes ONCE — a lazy union of the six aggregates would recompute
    * stage N's whole prefix for every later branch. `decontamN` defaults
    * to [[Decontaminate]]'s production 8 — q64 passes 3 explicitly for
    * the synthetic corpus. */
  def report(train: DataFrame, benchmark: DataFrame,
             idCol: String, textCol: String, mixWeight: Column,
             decontamN: Int = 8, budgetWords: Int = 120,
             bucketSize: Int = 16): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val s = stages(train, benchmark, idCol, textCol, mixWeight, decontamN)
    s.quality.cache(); s.deduped.cache(); s.decontaminated.cache()
    try {
      val seqs = Packing.packGreedy(s.mixed, idCol, textCol, budgetWords, bucketSize)
        .toDF().select(col("bucket"), col("seq_index")).distinct()
      Seq(
        (0, "input", train.count()), (1, "quality", s.quality.count()),
        (2, "exact_dedup", s.deduped.count()),
        (3, "decontaminated", s.decontaminated.count()),
        (4, "mixed", s.mixed.count()), (5, "packed_sequences", seqs.count()))
        .toDF("stage_index", "stage", "n")
    } finally {
      s.quality.unpersist(false)
      s.deduped.unpersist(false)
      s.decontaminated.unpersist(false)
    }
  }

  /** The curated corpus itself (everything the report counts at stage 4,
    * with its packed sequence assignment attached). */
  def curate(train: DataFrame, benchmark: DataFrame,
             idCol: String, textCol: String, mixWeight: Column,
             decontamN: Int = 8, budgetWords: Int = 120,
             bucketSize: Int = 16): DataFrame = {
    val s = stages(train, benchmark, idCol, textCol, mixWeight, decontamN)
    // the mixed frame feeds BOTH join sides below; a lazy localCheckpoint
    // materializes the four-stage prefix once at first use and truncates
    // the lineage, instead of re-running the quality battery, the dedup
    // window, and the gram join per branch (blocks are released by the
    // ContextCleaner when the result frame is no longer referenced)
    val mixed = s.mixed.localCheckpoint(false)
    val packed = Packing.packGreedy(mixed, idCol, textCol, budgetWords, bucketSize)
      .toDF().withColumnRenamed("doc_id", "__pid")
    mixed.join(packed, col(idCol) === col("__pid")).drop("__pid")
  }
}
