package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream
  * onto a fixed-step grid with forward fill, and equi-width value
  * histograms — the gap-filling / distribution-audit steps a metrics
  * pipeline runs before charting or feature extraction.
  *
  * Scale shape: the grid is generated per key from a key-cardinality
  * min/max aggregate (`sequence` explodes inside the task — no
  * shuffle beyond the agg), and the fill is `AsofJoin.asofBackward`'s
  * single-shuffle union+window encoding. Nothing driver-side; the
  * expansion factor is (time span / step) per key and stays in-task.
  */
object Resample {

  /** Per-key fixed-step grid with forward fill: grid points at
    * epoch-aligned multiples of `stepSec` within the key's observed
    * [min ts, max ts] span; each grid point carries the value of the
    * LAST observation at-or-before it (>= semantics exactly as
    * `asofBackward`). Epoch alignment (not min-ts alignment) makes
    * the grid insensitive to which rows a filter keeps — two engines
    * computing the grid independently agree bit-for-bit.
    *
    * Output: (key, grid_ts, value-cols...) one row per grid point.
    */
  def resampleFillForward(obs: DataFrame, key: String, ts: String,
                          stepSec: Long, valueCols: Seq[String]): DataFrame = {
    require(stepSec > 0)
    // long epoch-seconds math throughout: ceil/floor of integer
    // division is exact, so grid endpoints are engine-independent
    val sec = unix_timestamp(col(ts))
    val spans = obs.select(col(key), sec.as("__s"))
      .groupBy(col(key))
      .agg(min(col("__s")).as("__lo"), max(col("__s")).as("__hi"))
      .select(col(key),
        // first multiple of step >= lo, in pure long arithmetic
        // (lo >= 0 for real timestamps): exact on any engine
        (expr(s"(__lo + ${stepSec - 1}) div $stepSec") * stepSec).as("__g0"),
        col("__hi"))
      .filter(col("__g0") <= col("__hi"))
    val grid = spans
      .select(col(key),
        explode(sequence(col("__g0"), col("__hi"), lit(stepSec))).as("__gs"))
      .select(col(key), timestamp_seconds(col("__gs")).as("grid_ts"))
    AsofJoin.asofBackward(grid, obs, key, "grid_ts", ts, valueCols)
  }

  /** Per-group equi-width histogram over [lo, hi) in `nbins` buckets:
    * bucket 0 = below lo, nbins+1 = at-or-above hi (SQL
    * `width_bucket` semantics, identical in Spark and DuckDB).
    * Emits only non-empty buckets with their [bucket_lo, bucket_hi)
    * bounds. One partial-aggregable count — runs in the scan stage.
    */
  def histogram(df: DataFrame, group: Column, value: Column,
                lo: Double, hi: Double, nbins: Int): DataFrame = {
    require(nbins > 0 && lo < hi)
    val w = (hi - lo) / nbins
    df.select(group.as("grp"),
        width_bucket(value, lit(lo), lit(hi), lit(nbins)).as("bucket"))
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("grp"), col("bucket"),
        round(lit(lo) + (col("bucket") - 1) * w, 6).as("bucket_lo"),
        round(lit(lo) + col("bucket") * w, 6).as("bucket_hi"),
        col("n"))
  }
}
