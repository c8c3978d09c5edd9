package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-based outlier handling over a numeric column, per
  * group — the robust-statistics gate a corpus pipeline runs on
  * length / score / perplexity distributions before training
  * (winsorize the tails, or drop Tukey-fence outliers) so a handful
  * of pathological documents can't dominate a loss or a mixture.
  *
  * Engine-parity design: percentile boundaries are EXACT interpolated
  * percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`) rounded
  * to 6 decimals before any comparison, and winsorized sums are
  * accumulated at 1e-6 fixed point (half-up, the `Quantize` rounding
  * pin) so integer addition keeps the aggregate order-independent —
  * the same trick as `TextMetrics.unigramSurprisal`.
  *
  * Scale shape: one percentile agg per group (Spark's `percentile`
  * is a single-pass partial aggregate), broadcast of the
  * group-cardinality boundary table back onto the rows, then a
  * partial-aggregable rollup. Two scans, no window, no driver state.
  * At 100 TB swap the exact percentile for `percentile_approx` (the
  * q83 pattern) — the boundary table shape is unchanged.
  */
object Outliers {

  private def fix6(c: Column): Column =
    floor(c * 1e6 + 0.5).cast("long")

  /** Per-group winsorized statistics: clamp `value` into the rounded
    * [pLo, pHi] percentile band of its group. Returns one row per
    * group: n, n_lo / n_hi (rows clamped from below / above), and
    * `mean6` — the winsorized mean at 1e-6 resolution (exact integer
    * aggregation, rounded once at output).
    */
  def winsorize(df: DataFrame, group: Column, value: Column,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi)
    val bounds = df.groupBy(group.as("__g"))
      .agg(round(percentile(value, lit(pLo)), 6).as("__lo"),
        round(percentile(value, lit(pHi)), 6).as("__hi"))
    df.select(group.as("__g"), value.as("__v"))
      .join(broadcast(bounds), "__g")
      .select(col("__g"),
        when(col("__v") < col("__lo"), 1L).otherwise(0L).as("__clo"),
        when(col("__v") > col("__hi"), 1L).otherwise(0L).as("__chi"),
        fix6(least(greatest(col("__v").cast("double"), col("__lo")), col("__hi"))).as("__w6"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), sum(col("__clo")).as("n_lo"),
        sum(col("__chi")).as("n_hi"),
        round(sum(col("__w6")).cast("double") / (count(lit(1)) * 1e6), 6).as("mean6"))
  }

  /** Per-group Tukey fences: rows outside
    * [q1 − k·IQR, q3 + k·IQR] are outliers. Returns one row per
    * group with the (rounded) fences and the outlier counts — the
    * audit table; filtering is `value BETWEEN lo_fence AND hi_fence`
    * against it.
    */
  def tukeyFences(df: DataFrame, group: Column, value: Column,
                  k: Double = 1.5): DataFrame = {
    val bounds = df.groupBy(group.as("__g"))
      .agg(round(percentile(value, lit(0.25)), 6).as("__q1"),
        round(percentile(value, lit(0.75)), 6).as("__q3"))
      .select(col("__g"),
        (col("__q1") - (col("__q3") - col("__q1")) * k).as("__lof"),
        (col("__q3") + (col("__q3") - col("__q1")) * k).as("__hif"))
    df.select(group.as("__g"), value.as("__v"))
      .join(broadcast(bounds), "__g")
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__v") < col("__lof"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("__v") > col("__hif"), 1L).otherwise(0L)).as("n_high"),
        round(min(col("__lof")), 6).as("lo_fence"),
        round(max(col("__hif")), 6).as("hi_fence"))
  }

  /** Per-group MAD (median absolute deviation) profile over an
    * INTEGRAL value — the robust dispersion gate that, unlike mean/
    * stddev z-scores, a few extreme rows cannot drag. Medians are
    * EXACT LOWER medians picked by rank (`row_number = (n+1) div 2`
    * over the sorted values), so every quantity in the output —
    * median, MAD, outlier counts (|v − med| > k·MAD) — is integer
    * arithmetic with no interpolation and no float-parity risk; any
    * SQL engine replays the identical selection.
    *
    * Returns one row per group: (group, n, med, mad, n_outliers).
    * NULL values are excluded up front — they are not population: a
    * null would otherwise sort first under the rank windows, shift
    * (or null out) the selected medians, and count into `n`.
    *
    * Scale note: exact rank selection sorts each group in one task
    * (two ordered windows on the group key). Groups here are
    * low-cardinality audit strata (languages, sources); for
    * data-scale groups swap the rank pick for `percentile_approx`
    * (the q83 pattern) — the profile shape is unchanged.
    */
  def madProfile(df: DataFrame, group: Column, value: Column,
                 k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k $k must be >= 1")
    val v = df.select(group.as("__g"), value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    def lowerMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("__g")).orderBy(col(c))
      in.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__g"))))
        .filter(col("__rn") === expr("(__n + 1) div 2"))
        .select(col("__g"), col(c).as(out))
    }
    val medTab = lowerMedian(v, "__v", "med")
    val dev = v.join(broadcast(medTab), "__g")
      .withColumn("__d", abs(col("__v") - col("med")))
    val madTab = lowerMedian(dev.select(col("__g"), col("__d")), "__d", "mad")
    dev.join(broadcast(madTab), "__g")
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("__d") > col("mad") * k, 1L).otherwise(0L)).as("n_outliers"))
  }
}
