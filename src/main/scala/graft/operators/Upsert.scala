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

  /** SCD-2 apply: advance a validity-versioned history table to a new
    * snapshot taken at `asOf`. History rows carry `valid_from` /
    * `valid_to` (BIGINT versions or epoch instants; `valid_to` NULL =
    * current). Per key:
    *  - value unchanged → the open row rides through;
    *  - value changed   → the open row closes at `asOf` and a new open
    *    row starts at `asOf`;
    *  - key gone from the snapshot → the open row closes (delete);
    *  - key new in the snapshot → a new open row (insert — including
    *    re-insert of a key whose older closed rows remain).
    * Already-closed rows are immutable and pass through untouched.
    *
    * `closeMissing = false` switches to PARTIAL-snapshot semantics: a
    * key absent from `snapshot` is merely UNOBSERVED and its open row
    * rides through — the contract for change feeds / micro-batches
    * (the streaming twin `streaming.StreamOps.scd2Sink`), where a
    * batch never asserts the absence of the keys it didn't carry.
    *
    * Plan: ONE full-outer hash join (current slice × snapshot); the
    * up-to-two output rows per key are emitted by exploding a per-row
    * struct array, so nothing re-reads or re-joins the inputs — the
    * single-pass MERGE plan, same scale contract as [[scd1]].
    */
  def scd2Apply(history: DataFrame, snapshot: DataFrame, key: String,
                asOf: Long, closeMissing: Boolean = true): DataFrame = {
    val payload = snapshot.columns.filterNot(_ == key).toSeq
    require(payload.nonEmpty,
      "snapshot needs at least one non-key column (a key-only snapshot " +
        "has no values to version)")
    require(history.columns.toSet ==
      snapshot.columns.toSet ++ Set("valid_from", "valid_to"),
      s"history must be snapshot schema + valid_from/valid_to; got " +
        s"${history.columns.mkString(",")} vs ${snapshot.columns.mkString(",")}")
    val outCols = (key +: payload) ++ Seq("valid_from", "valid_to")
    val closed = history.filter(col("valid_to").isNotNull)
      .select(outCols.map(col): _*)
    val current = history.filter(col("valid_to").isNull)
      .withColumn("__c_present", lit(true))
    val s = payload.foldLeft(snapshot)((df, c) => df.withColumnRenamed(c, s"__s_$c"))
      .withColumn("__s_present", lit(true))
    val j = current.join(s, Seq(key), "full_outer")
    val cP = col("__c_present").isNotNull
    val sP = col("__s_present").isNotNull
    val same = payload.map(c => col(c) <=> col(s"__s_$c")).reduce(_ && _)
    val kept = struct(payload.map(col) ++
      Seq(col("valid_from"), col("valid_to")): _*)
    val closedNow = struct(payload.map(col) ++
      Seq(col("valid_from"), lit(asOf).cast("long").as("valid_to")): _*)
    val opened = struct(payload.map(c => col(s"__s_$c").as(c)) ++
      Seq(lit(asOf).cast("long").as("valid_from"),
        lit(null).cast("long").as("valid_to")): _*)
    val rows = when(cP && sP && same, array(kept))
      .when(cP && sP && !same, array(closedNow, opened))
      .when(cP && !sP, if (closeMissing) array(closedNow) else array(kept))
      .otherwise(array(opened))
    val applied = j.select(col(key), explode(rows).as("__r"))
      .select(col(key) +: (payload ++ Seq("valid_from", "valid_to"))
        .map(c => col(s"__r.$c").as(c)): _*)
    closed.unionByName(applied)
  }

  /** Incremental aggregate-table maintenance: fold a delta batch's
    * partial aggregates into a persisted rollup without rescanning
    * history — new_count = old + delta, new_sum = old + delta,
    * new_min/max = least/greatest. The 100 TB discipline for every
    * dashboard rollup: the corpus is append-only, so COUNT/SUM/MIN/
    * MAX (the decomposable aggregates) maintain in one key-joined
    * pass over table-of-groups-sized relations; a full recompute
    * re-reads the corpus.
    *
    * `table` and `delta` share the schema (key cols + measure cols);
    * `counts`/`sums` add, `mins`/`maxs` fold with least/greatest —
    * all null-safe (a key new to either side contributes its own
    * values unchanged). One full-outer hash join on the group key.
    */
  def incrementalAggMerge(table: DataFrame, delta: DataFrame, keys: Seq[String],
                          counts: Seq[String] = Nil, sums: Seq[String] = Nil,
                          mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty)
    val measures = counts ++ sums ++ mins ++ maxs
    require(table.columns.toSet == delta.columns.toSet &&
      table.columns.toSet == (keys ++ measures).toSet,
      s"schema mismatch: ${table.columns.mkString(",")} vs keys=$keys measures=$measures")
    val d = measures.foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"__d_$c"))
    val folded = (counts ++ sums).map(c =>
      (coalesce(col(c), lit(0L)) + coalesce(col(s"__d_$c"), lit(0L))).as(c)) ++
      mins.map(c => least(col(c), col(s"__d_$c")).as(c)) ++
      maxs.map(c => greatest(col(c), col(s"__d_$c")).as(c))
    table.join(d, keys, "full_outer")
      .select(keys.map(col) ++ folded: _*)
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
