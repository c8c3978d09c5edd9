package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the constraint-validation pass a
  * 100 TB ingest runs before publishing a snapshot (null fractions,
  * value ranges, accepted values, key uniqueness, referential
  * integrity). The reference validates implicitly (crashes on missing
  * dict keys — SURVEY §2 P6); here the checks are first-class,
  * composable, and return evidence counts instead of throwing.
  *
  * Every check emits one row: (check, subject, violations, total).
  * Scale shape: row-level checks (null / range / accepted) are ONE
  * partial-aggregable conditional-sum pass over the scan — multiple
  * checks on the same relation fuse into a single `agg` (one job, one
  * scan, no shuffle beyond the 1-row final agg). Uniqueness is one
  * keyed count; referential integrity is one anti-join count with the
  * parent side reduced to its distinct key first. Nothing
  * driver-side except the 1-row results.
  */
object Quality {

  /** A row-level predicate check: `violations` counts rows FAILING
    * `ok` (null predicate result counts as a failure — null-hostile,
    * like SQL constraint semantics).
    */
  final case class RowCheck(name: String, subject: String, ok: Column)

  /** Run all row-level checks on `df` in ONE aggregation pass: the
    * wide 1-row aggregate is exploded into long format in the same
    * plan (a per-check union would replicate the aggregate subtree
    * instead).
    */
  def rowChecks(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty)
    // coalesce each sum: over an EMPTY relation sum() is null, and a
    // downstream getLong/threshold compare on the audit row would NPE
    // (violations = 0 of total = 0 is the correct empty-input audit)
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      coalesce(sum(when(coalesce(c.ok, lit(false)), 0L).otherwise(1L)),
        lit(0L)).as(s"__v$i")
    } :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("check_name"), lit(c.subject).as("subject"),
          col(s"__v$i").as("violations"), col("__n").as("total"))
      }: _*)).as("r"))
      .select("r.*")
  }

  /** Expectations gate with quarantine: split the relation into rows
    * passing ALL checks and rows failing ANY (null predicate results
    * fail, same null-hostile semantics as [[rowChecks]]); the
    * quarantine side carries a `failed_checks` column naming every
    * violated check (comma-joined, declaration order) — the evidence
    * a triage pass needs. The DLT-expectations / write-audit-publish
    * shape: the good rows publish, the bad rows land in a side table
    * with their reasons, nothing is silently dropped.
    *
    * Both sides are pure filters over the same scan — each check
    * evaluates in the scan stage (codegen, no shuffle); writing the
    * two sides re-reads the source rather than caching it, the right
    * trade at 100 TB where the quarantine side is ~empty and a cache
    * of the full relation would be pure cost.
    */
  def quarantine(df: DataFrame, checks: Seq[RowCheck])
      : (DataFrame, DataFrame) = {
    require(checks.nonEmpty)
    val oks = checks.map(c => coalesce(c.ok, lit(false)))
    val allOk = oks.reduce(_ && _)
    val failed = concat_ws(",", checks.zip(oks).map { case (c, ok) =>
      when(!ok, lit(c.name)) }: _*)
    (df.filter(allOk),
      df.filter(!allOk).withColumn("failed_checks", failed))
  }

  /** Key-uniqueness check: `violations` = surplus rows beyond one per
    * key (0 ⇔ key is unique). One keyed count — partial-aggregable.
    */
  def uniqueCheck(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"),
        coalesce(sum(col("__n")), lit(0L)).as("total"))
      .select(lit(name).as("check_name"), lit(keys.mkString(",")).as("subject"),
        col("violations"), col("total"))

  /** Referential-integrity check: `violations` = child rows whose key
    * has no match in the parent (null child keys count as orphans,
    * matching the anti-join). Parent reduces to distinct keys before
    * the join — at scale a broadcast or bloom-prefiltered anti-join
    * (`operators.Bloom`).
    */
  def refCheck(child: DataFrame, childKey: String, parent: DataFrame,
               parentKey: String, name: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val total = child.agg(count(lit(1)).as("total"))
    orphans.crossJoin(total)
      .select(lit(name).as("check_name"),
        lit(s"$childKey->$parentKey").as("subject"),
        col("violations"), col("total"))
  }

  /** Column profiler — the ANALYZE-TABLE summary a lake keeps per
    * snapshot: one row per profiled column with
    * (n_rows, n_null, n_distinct, min_val, max_val). EXACT counts
    * (distincts included — the approx variant is q40's HLL surface),
    * computed in ONE aggregation job: all columns' aggregates sit in
    * a single 1-row `agg` (Catalyst plans the multi-distinct via its
    * Expand rewrite — one scan, cost ∝ #distinct-columns, the same
    * plan a hand-written GROUPING SETS would get) and the wide row
    * explodes to long format in the same plan. min/max aggregate in
    * the column's NATIVE type (numeric min, not string min) and only
    * the result casts to string for the uniform long schema.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")) }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /** The data-scale twin of [[profile]]: HLL++ distinct estimates
    * (`approx_count_distinct`, column `n_distinct_approx`) instead of
    * exact multi-distinct. Same long output shape otherwise.
    *
    * Why it exists: N exact `countDistinct`s in one agg plan through
    * Catalyst's Expand rewrite — the scan replicates N+1× and every
    * column's FULL key set shuffles, fine for audit strata (q170's
    * point), wrong as the routine snapshot profile of a 100 TB fact
    * table. HLL sketches are partial-aggregable bounded state: this
    * plan is ONE un-replicated scan, map-side combine, a 1-row final
    * agg — no Expand, no key-set shuffle (PlanAuditSpec pins that).
    * `rsd` is the sketch's target relative standard deviation; the
    * q179 envelope oracle pins |approx − exact| within an outer 3·rsd
    * band against the exact profile at every SF.
    */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profileApprox needs at least one column")
    require(rsd > 0.0 && rsd < 1.0, s"rsd $rsd out of (0, 1)")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c => Seq(
      count(col(c)).as(s"__nn_$c"),
      approx_count_distinct(col(c), rsd).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")) }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct_approx"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))): _*)).as("p"))
      .select(col("p.*"))
  }

  // ================= re-identification risk audits =================
  //
  // The privacy complement of dictionary redaction (Tagging.redact
  // scrubs KNOWN strings; these audits find rows identifiable by the
  // COMBINATION of innocuous attributes): k-anonymity — every
  // quasi-identifier equivalence class must hold >= k rows — and
  // l-diversity — each class must also span >= l distinct values of a
  // sensitive attribute (a k-anonymous class whose members all share
  // one sensitive value still leaks it). Sweeney's k-anonymity and
  // Machanavajjhala's l-diversity, as single keyed aggregations:
  // class-count-sized output, partial-aggregable, one shuffle —
  // linear at any corpus size.

  /** k-anonymity audit: one row per quasi-identifier equivalence
    * class — (quasiIds..., class_size, at_risk) with `at_risk` =
    * class_size < k. Publishing gates on `at_risk` being empty;
    * generalize (bucket, drop, or coarsen a quasi-identifier) and
    * re-audit until it is. NULL is a class value like any other
    * (groupBy semantics): all-NULL rows form their own class rather
    * than escaping the audit.
    */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    require(quasiIds.nonEmpty, "kAnonymity needs at least one quasi-identifier")
    require(k >= 2, s"kAnonymity with k=$k is vacuous — need k >= 2")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
      .orderBy(quasiIds.map(col): _*)
  }

  /** l-diversity audit: per quasi-identifier class, the number of
    * DISTINCT sensitive-attribute values — (quasiIds..., class_size,
    * n_sensitive, diverse) with `diverse` = n_sensitive >= l. Runs on
    * the same single-shuffle shape as [[kAnonymity]] (count +
    * count-distinct in one keyed agg).
    */
  def lDiversity(df: DataFrame, quasiIds: Seq[String], sensitive: String,
                 l: Int): DataFrame = {
    require(quasiIds.nonEmpty, "lDiversity needs at least one quasi-identifier")
    require(!quasiIds.contains(sensitive),
      s"sensitive column '$sensitive' cannot also be a quasi-identifier")
    require(l >= 2, s"lDiversity with l=$l is vacuous — need l >= 2")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitive)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
      .orderBy(quasiIds.map(col): _*)
  }
}
