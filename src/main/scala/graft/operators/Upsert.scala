package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot maintenance — merging a delta batch into a base table
  * (SCD-1 upsert) and classifying a new snapshot against the old one
  * (CDC diff). A 100 TB corpus is not rebuilt from scratch per crawl:
  * each refresh lands as a delta that must be merged by key, and the
  * operational question "what changed?" is a first-class query.
  *
  * Reference scope: the reference re-runs its pipelines from scratch
  * per invocation (CSV step files, load_from_files —
  * /root/reference/x2.2.py:249-256); incremental maintenance is part
  * of the north-star pipeline surface (with `Dedup.dedupIncremental`
  * as the dedup-side analogue).
  *
  * Both operators are ONE full-outer hash join on the key — the plan
  * a MERGE statement compiles to in table-format engines. No
  * driver-side state; AQE handles the skewed-key case. At cluster
  * scale, bucket both sides by the key (`sources.Bucketing`) and the
  * exchange disappears.
  */
object Upsert {

  /** SCD-1 merge: for each key, the delta row wins in full (update),
    * base-only keys survive unchanged, delta-only keys insert. A
    * NULL in a delta column is an update TO null (presence is
    * tracked with a marker column, not value-coalesce — the classic
    * MERGE-vs-COALESCE null bug).
    */
  def scd1(base: DataFrame, delta: DataFrame, key: String): DataFrame = {
    require(base.columns.toSet == delta.columns.toSet,
      s"schema mismatch: base ${base.columns.mkString(",")} vs delta ${delta.columns.mkString(",")}")
    val cols = base.columns.filterNot(_ == key).toSeq
    val d = cols.foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"__d_$c"))
      .withColumn("__d_present", lit(true))
    base.join(d, Seq(key), "full_outer")
      .select((col(key) +: cols.map(c =>
        when(col("__d_present").isNotNull, col(s"__d_$c")).otherwise(col(c)).as(c))): _*)
  }

  /** CDC classification of snapshot `next` against snapshot `prev`:
    * one row per key with `op` ∈ insert / delete / update /
    * unchanged. Value comparison is null-safe (`<=>`) over every
    * non-key column.
    */
  def cdcDiff(prev: DataFrame, next: DataFrame, key: String): DataFrame = {
    require(prev.columns.toSet == next.columns.toSet)
    val cols = prev.columns.filterNot(_ == key).toSeq
    val p = cols.foldLeft(prev)((df, c) => df.withColumnRenamed(c, s"__p_$c"))
      .withColumn("__p_present", lit(true))
    val n = cols.foldLeft(next)((df, c) => df.withColumnRenamed(c, s"__n_$c"))
      .withColumn("__n_present", lit(true))
    val same = cols.map(c => col(s"__p_$c") <=> col(s"__n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    p.join(n, Seq(key), "full_outer")
      .select(col(key),
        when(col("__p_present").isNull, "insert")
          .when(col("__n_present").isNull, "delete")
          .when(same, "unchanged")
          .otherwise("update").as("op"))
  }
}
