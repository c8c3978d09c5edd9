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
    * The first grid point is the first step multiple at-or-after the
    * key's TRUE first observation, computed in exact microsecond
    * arithmetic — truncating to whole seconds first would let a
    * sub-second first observation (e.g. 00:00:00.5 with a grid step
    * landing on 00:00:00) produce a grid point BEFORE any
    * observation, i.e. a null fill row that an inner as-of (the
    * DuckDB `ASOF JOIN` shape) drops. With the exact bound, every
    * grid point has an observation at-or-before it, so left and
    * inner as-of agree and no null fill rows exist.
    *
    * Output: (key, grid_ts, value-cols...) one row per grid point.
    */
  def resampleFillForward(obs: DataFrame, key: String, ts: String,
                          stepSec: Long, valueCols: Seq[String]): DataFrame = {
    require(stepSec > 0)
    // exact long microsecond math throughout: ceil/floor of integer
    // division is exact, so grid endpoints are engine-independent
    val stepUs = stepSec * 1000000L
    val spans = obs.select(col(key), unix_micros(col(ts)).as("__us"))
      .groupBy(col(key))
      .agg(min(col("__us")).as("__lo"), max(col("__us")).as("__hi"))
      .select(col(key),
        // first step multiple (in s) >= the exact first observation
        // (lo >= 0 for real timestamps): exact on any engine
        (expr(s"(__lo + ${stepUs - 1}) div $stepUs") * stepSec).as("__g0"),
        // last step candidate: floor seconds of the exact max
        expr("__hi div 1000000").as("__hi"))
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
