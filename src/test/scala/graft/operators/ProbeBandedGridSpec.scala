package graft.operators
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round 19 (verdict ask #1): the banded routes' hot-bucket probe.
 * `probeBandedGrid` is ONE tiny aggregate over a route's count join that
 * answers (does any bucket actually exceed the cap?, how many grid cells
 * will the scan build?) — so a finite default cap no longer forces the
 * min-mate reduce on provably-cold runs. The probe must agree with
 * [[SimilarityJoin.isHotBucket]] BIT FOR BIT (same overflow-safe integer
 * division) and with [[SimilarityJoin.deltaGrid]]/[[SimilarityJoin.batchGrid]]'s
 * cell layout (hot bucket → nb covering cells, cold → nb(nb+1)/2
 * block-pair cells), or a cold run could silently skip a reduce it
 * needed (wrong output) / a hot run could under-partition the scan.
 */
class ProbeBandedGridSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val blockRows = 2048

  private def nbOf(m: Long): Long = math.max(1L, (m + blockRows - 1) / blockRows)
  private def cellsOf(m: Long, hot: Boolean): Long = {
    val nb = nbOf(m)
    if (hot) nb else nb * (nb + 1) / 2
  }

  test("delta probe: anyHot and cell count match isHotBucket + deltaGrid layout") {
    // (m, m_new) fixtures straddling the cap from both sides, including
    // the exact boundary (m * m_new == cap is NOT hot: isHotBucket is a
    // strict >) and multi-block buckets
    val cap = 10000L
    val counts = Seq[(Long, Long)](
      (2L, 1L),              // minimal surviving bucket
      (100L, 100L),          // work 10000 == cap exactly → NOT hot
      (101L, 100L),          // work 10100 > cap → hot
      (5000L, 1L),           // nb=3, cold (work 5000)
      (5000L, 3L),           // nb=3, hot (work 15000)
      (cap, 1L),             // work == cap → NOT hot
      (cap + 1L, 1L)         // work cap+1 → hot
    )
    val df = counts.toDF("m", "m_new")
    val (anyHot, cells) =
      SimilarityJoin.probeBandedGrid(df, cap, blockRows, Some("m_new"))
    val expHot = counts.map { case (m, mn) => SimilarityJoin.isHotBucket(m, mn, cap) }
    assert(anyHot === expHot.exists(identity))
    val expCells = counts.zip(expHot).map { case ((m, _), h) => cellsOf(m, h) }.sum
    assert(cells === expCells)
    // per-row boundary pin: exactly-at-cap is cold, one past is hot
    val (hotAtCap, _) = SimilarityJoin.probeBandedGrid(
      Seq((100L, 100L)).toDF("m", "m_new"), cap, blockRows, Some("m_new"))
    assert(!hotAtCap, "m * m_new == cap must NOT be hot (strict >)")
    val (hotPastCap, _) = SimilarityJoin.probeBandedGrid(
      Seq((101L, 100L)).toDF("m", "m_new"), cap, blockRows, Some("m_new"))
    assert(hotPastCap)
  }

  test("batch probe (mNewCol = None): m² semantics match isHotBucket(m, m, cap)") {
    val cap = 1000000L
    val counts = Seq(2L, 999L, 1000L, 1001L, 4096L).map(m => Tuple1(m))
    val df = counts.toDF("m")
    val (anyHot, cells) = SimilarityJoin.probeBandedGrid(df, cap, blockRows, None)
    val expHot = counts.map(t => SimilarityJoin.isHotBucket(t._1, t._1, cap))
    assert(anyHot === expHot.exists(identity))
    // 1000² == cap → not hot; 1001² > cap → hot
    assert(!SimilarityJoin.isHotBucket(1000L, 1000L, cap))
    assert(SimilarityJoin.isHotBucket(1001L, 1001L, cap))
    val expCells = counts.zip(expHot).map { case (t, h) => cellsOf(t._1, h) }.sum
    assert(cells === expCells)
  }

  test("probe is overflow-safe at corpus-scale counts") {
    // 10^9-row bucket under a small cap: m * m_new would overflow a Long
    // in the naive form; the division form must still say hot, and the
    // cell count must stay exact
    val df = Seq((1000000000L, 1000000000L)).toDF("m", "m_new")
    val (anyHot, cells) =
      SimilarityJoin.probeBandedGrid(df, 65536L, blockRows, Some("m_new"))
    assert(anyHot)
    assert(cells === nbOf(1000000000L)) // hot → nb covering cells
  }

  test("empty counts probe cold (no buckets, no cells)") {
    val df = Seq.empty[(Long, Long)].toDF("m", "m_new")
    val (anyHot, cells) =
      SimilarityJoin.probeBandedGrid(df, 65536L, blockRows, Some("m_new"))
    assert(!anyHot)
    assert(cells === 0L)
  }

  test("gridPartitions: 2x cells, floored at parallelism, clamped to maxPartitions") {
    assert(SimilarityJoin.gridPartitions(0L, 128) === 1)
    // r20 (r19 ADVICE #3): any non-zero cell count floors at the
    // session parallelism (maxPartitions/4) — a handful of heavy cells
    // must not share 2×cells partitions in the dense-capped regime
    assert(SimilarityJoin.gridPartitions(1L, 128) === 32)
    assert(SimilarityJoin.gridPartitions(10L, 128) === 32)
    assert(SimilarityJoin.gridPartitions(20L, 128) === 40)    // 2x above floor
    assert(SimilarityJoin.gridPartitions(64L, 128) === 128)   // 2x hits max
    assert(SimilarityJoin.gridPartitions(1000000L, 128) === 128)
    assert(SimilarityJoin.gridPartitions(Long.MaxValue / 2, 128) === 128)
    // degenerate width: floor never exceeds the clamp
    assert(SimilarityJoin.gridPartitions(1L, 2) === 2)
  }
}
