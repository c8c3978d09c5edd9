package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling — the data-quality summary a 100 TB
  * corpus pipeline runs before trusting an ingest: per-column null
  * counts, distinct cardinalities and min/max, computed in ONE
  * aggregation job over one scan.
  *
  * Reference scope: the reference trusts its inputs implicitly (its
  * CSV reloads at /root/reference/x2.2.py:249-256 carry no
  * validation); at platform scale a profile gate is the first
  * operator of every ingest DAG.
  *
  * Plan shape: the multi-column exact distinct plans as a single
  * Expand + one shuffle (one input row becomes #cols rows, each
  * tagged with its grouping id) — #cols × scan volume through one
  * exchange, never a per-column pass over the table. For wide tables
  * or purely advisory profiles, `exact = false` swaps every
  * cardinality to `approx_count_distinct` (HLL++, map-side, no
  * Expand) — the scale knob; the exact form is the oracle-checkable
  * contract.
  */
object Profiling {

  /** Profile `cols` of `df`: one output row per column —
    * (col_name, n_rows, n_null, n_distinct, min_s, max_s), min/max
    * computed in the column's native type and RENDERED to string
    * (one uniform output schema across heterogeneous columns).
    * Distinct counts exclude nulls (the SQL COUNT(DISTINCT)
    * convention). Deterministic order: col_name ascending.
    */
  def profileTable(df: DataFrame, cols: Seq[String],
                   exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileTable: no columns requested")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"profileTable: ${missing.mkString(", ")} not in " +
        s"[${df.columns.mkString(", ")}]")
    def dist(c: String): Column =
      if (exact) countDistinct(col(c))
      else approx_count_distinct(col(c))
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        dist(c).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select("r.*")
      .orderBy("col_name")
  }

  /** Drift gate between two [[profileTable]] outputs (reference
    * profile `a`, candidate ingest `b`) — the check that turns the
    * profile into a GATE: per column, null-rate movement, distinct-
    * cardinality ratio and min/max range change, folded into one
    * `drifted` verdict. Column-set changes surface as status
    * `added`/`removed` rows (full outer join on col_name — a vanished
    * column must fail the gate loudly, not disappear from the
    * report). Both profiles are already column-count-sized — the diff
    * is catalog-cost at any corpus scale; all arithmetic is
    * single-op IEEE + round(…, 6), the cross-engine-stable
    * convention, so the whole gate replays exactly in SQL.
    *
    * `drifted` iff: the column was added or removed; |null_rate_b −
    * null_rate_a| > nullTol; the distinct ratio b/a leaves
    * [1/distinctRatio, distinctRatio]; or min_s/max_s changed
    * (null-safe compare).
    */
  def profileDiff(a: DataFrame, b: DataFrame, nullTol: Double = 0.01,
                  distinctRatio: Double = 2.0): DataFrame = {
    require(nullTol >= 0.0, s"profileDiff: nullTol must be >= 0, got $nullTol")
    require(distinctRatio >= 1.0,
      s"profileDiff: distinctRatio must be >= 1, got $distinctRatio")
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col("col_name"),
        col("n_rows").as(s"n_rows_$tag"), col("n_null").as(s"n_null_$tag"),
        col("n_distinct").as(s"n_distinct_$tag"),
        col("min_s").as(s"min_$tag"), col("max_s").as(s"max_$tag"))
    val j = side(a, "a").join(side(b, "b"), Seq("col_name"), "full_outer")
    val status = when(col("n_rows_a").isNull, lit("added"))
      .when(col("n_rows_b").isNull, lit("removed"))
      .otherwise(lit("common"))
    def rate(tag: String): Column = round(
      col(s"n_null_$tag").cast("double") / col(s"n_rows_$tag"), 6)
    val ratio = round(
      col("n_distinct_b").cast("double") / col("n_distinct_a"), 6)
    val rangeChanged = !(col("min_a") <=> col("min_b")) ||
      !(col("max_a") <=> col("max_b"))
    val drifted = (status =!= "common") ||
      (abs(rate("b") - rate("a")) > nullTol) ||
      (ratio > distinctRatio) || (ratio < lit(1.0) / distinctRatio) ||
      rangeChanged
    j.select(col("col_name"), status.as("status"),
        rate("a").as("null_rate_a"), rate("b").as("null_rate_b"),
        ratio.as("distinct_ratio"), rangeChanged.as("range_changed"),
        drifted.as("drifted"))
      .orderBy("col_name")
  }
}
