package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys — the classic mitigation when one
 * join key carries a disproportionate share of rows (a viral document,
 * a default/null-ish category, one giant collection): a plain shuffle
 * sends every row of the hot key to ONE reducer, which then runs as
 * long as the whole rest of the stage combined.
 *
 * The salt scatters the BIG side's rows across `salts` sub-keys
 * (deterministic per-row hash — reruns shuffle identically) and
 * replicates the SMALL side once per salt value, so the join key
 * becomes `(key, salt)` and the hot key's rows spread over `salts`
 * reducers. The output is row-identical to the plain join: each big
 * row meets exactly the one replica carrying its salt.
 *
 * When to reach for it: Spark's AQE already splits skewed SORT-MERGE
 * join partitions at runtime (`spark.sql.adaptive.skewJoin`), which is
 * the first answer and free. Explicit salting remains the tool when
 * the skew survives AQE — hash joins AQE won't split, skew on the
 * build side, or a replicated-small-side shape you want guaranteed at
 * plan time rather than discovered at runtime. Cost model: the small
 * side is duplicated `salts`× through the shuffle — size `salts` to
 * the hot key's excess (hot-rows / average-rows), not to the cluster.
 */
object SkewJoin {

  /** Inner equi-join of `big ⋈ small` on `key`, salted `salts` ways.
    * Row-identical to `big.join(small, key)` for any inputs; the hot
    * key's shuffle load spreads over `salts` reducers. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val spark = big.sparkSession
    // per-row scatter via the row index — type-agnostic (hashing all
    // columns would reject map columns a plain join accepts) and a
    // perfect round-robin spread of the hot key. The join RESULT is
    // independent of which salt a row gets (each row matches exactly
    // its replica), so task-retry id instability cannot change output.
    val bigS = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val saltRange = spark.range(salts).select(col("id").cast("int").as("__salt"))
    val smallS = small.crossJoin(broadcast(saltRange))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
