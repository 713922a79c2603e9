package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dataset mixing — deterministic weighted source sampling, the step that
 * composes a training corpus from heterogeneous sources at chosen
 * proportions (e.g. 100% of a curated source, 25% of a crawl dump).
 *
 * The keep decision is a pure function of the row id: `u(id) < weight`,
 * where `u(id)` is the first 48 bits of `md5(id)` scaled to [0, 1). No
 * RNG state, no `rand()` — the same row is kept or dropped on every
 * run, on every cluster, and in the DuckDB oracle (q62), which is what
 * makes ablation reruns and incremental pipeline re-executions
 * reproducible. Column-expression only: the sample is a pushdown-friendly
 * `WHERE` over a codegen'd hash, one streaming pass at 100 TB with no
 * shuffle; the report is one hash aggregation on the source key.
 */
object Mixing {

  /** Deterministic uniform in [0, 1): first 48 md5 bits of the id. */
  def hashUniform(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long") /
      lit(281474976710656.0) // 2^48

  /** Rows kept under per-row `weight` (a Column in [0, 1] — typically
    * derived from the source column or joined from a weights table). */
  def weightedSample(docs: DataFrame, idCol: String, weight: Column): DataFrame =
    docs.where(hashUniform(col(idCol)) < weight)

  /** Per-source audit of a mixing run: configured weight vs achieved
    * keep rate (they converge as sources grow; the report is how a
    * pipeline VERIFIES its mix instead of trusting it). */
  def mixingReport(docs: DataFrame, idCol: String, sourceCol: String,
                   weight: Column): DataFrame = {
    val kept = (hashUniform(col(idCol)) < weight).cast("long")
    // min, not first(): first() without ordering is partition-arrival
    // nondeterministic if a caller's weight ever varies within a source
    // group — and it must match the oracle's min(weight)
    // keep_rate is the RAW IEEE quotient, not round(x, 6): float64
    // division is bit-identical across engines, while round() straddles
    // HALF_UP/HALF_EVEN on …5e-7 boundaries and breaks value-hash parity
    docs.groupBy(col(sourceCol))
      .agg(min(weight).as("weight"),
        count(lit(1)).as("n_total"),
        sum(kept).as("n_kept"),
        (sum(kept).cast("double") / count(lit(1)).cast("double"))
          .as("keep_rate"))
  }
}
