package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational operator algebra as DataFrame
  * combinators — one per row of SURVEY.md §2. Everything here is a
  * composition of Spark built-ins so the whole surface stays inside
  * Catalyst/whole-stage-codegen; nothing collects to the driver.
  *
  * Scale notes (100 TB): every combinator is shuffle-transparent —
  * `dedupKeepFirst`/`firstPerGroup` are single-shuffle window ops on
  * the partition key; `semi`/`anti` are joins that AQE can turn into
  * broadcasts when the right side is small; nothing forces a global
  * sort except the explicitly-ordered top-k helpers.
  */
object RelOps {

  /** SO5 — keep-first dedup with a DETERMINISTIC winner.
    * The reference dedups with insertion-ordered Python sets
    * (/root/reference/opentargets_client_api.py:112-118); Spark's
    * `dropDuplicates` picks an arbitrary row after a shuffle, so the
    * faithful (and oracle-stable) form is a row_number window over an
    * explicit order (SURVEY.md §7.4).
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** O3 — top-1 per group (the reference's `rows[0]` per drug,
    * /root/reference/x2.py:215). Same window pattern; `order` must be
    * a total order (add a key tiebreaker) for determinism.
    */
  def firstPerGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    dedupKeepFirst(df, keys, order)

  /** O2 — global top-k with deterministic tiebreak (search top hit,
    * /root/reference/candidate_drugs.py:90). TakeOrderedAndProject:
    * Spark plans orderBy+limit as a per-partition top-k + driver
    * merge, no global sort — safe at any scale.
    */
  def topK(df: DataFrame, k: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** P3 — threshold filter (`score >= 0.33`,
    * /root/reference/candidate_drugs.py:108-109). Pushed to the scan
    * by Catalyst.
    */
  def thresholdFilter(df: DataFrame, scoreCol: Column, minScore: Double): DataFrame =
    df.filter(scoreCol >= lit(minScore))

  /** P4 — blocklist anti-filter on a literal id list
    * (`remove_diseases`, /root/reference/x2.2.py:214-227).
    */
  def blocklist(df: DataFrame, idCol: Column, ids: Seq[Any]): DataFrame =
    df.filter(!idCol.isin(ids: _*))

  /** S2 — entity search: substring match + relevance rank. The
    * reference's `search(queryString, entityNames)`
    * (/root/reference/opentargets_query.py:4-21) returns ranked hits;
    * relevance here is the caller-supplied score column, tiebroken
    * for determinism by the caller's order columns.
    */
  def search(df: DataFrame, textCol: Column, query: String): DataFrame =
    df.filter(lower(textCol).contains(query.toLowerCase))

  /** SO1 via left_anti — set difference that PRESERVES payload
    * columns (the reference re-looks-up names after its `set`
    * subtraction, /root/reference/candidate_drugs.py:158-164; the
    * anti-join makes that second pass disappear).
    */
  def anti(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** SO2 / J13 — semi-join (set intersection keeping left payload;
    * also the "skip already-fetched" guard,
    * /root/reference/x2.py:205-208).
    */
  def semi(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  /** J1-J9 — the API fan-out collapses to a plain equi-join: the
    * reference loops one HTTP request per driving row
    * (/root/reference/opentargets_client_api.py:133-156); in Spark
    * the whole fan-out is a single distributed hash join and the
    * provenance columns (P8) come free as retained join keys.
    */
  def fanout(driving: DataFrame, expand: DataFrame, keys: Seq[String]): DataFrame =
    driving.join(expand, keys, "inner")

  /** Skew-tolerant equi-join by key salting: the left (skewed) side
    * gets a random-but-deterministic salt in [0, salt), the right
    * side is replicated `salt` times, and the join runs on
    * (key, salt) — spreading a hot key over `salt` reducers. AQE's
    * skew-join split handles most cases automatically; explicit
    * salting is for the pathological single-key hotspots (null-heavy
    * foreign keys, celebrity entities) AQE can't split further.
    * Deterministic: the salt is a hash of the whole left row, not
    * rand(), so retries and the DuckDB oracle see stable results.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salt >= 1 && salt <= 1024)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salt)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** A3 — collect-to-sorted-list per group
    * (/root/reference/opentargets_client_api.py:235-249). Sorted so
    * downstream comparisons are deterministic.
    */
  def collectPerGroup(df: DataFrame, keys: Seq[Column], valueCol: Column, as: String): DataFrame =
    df.groupBy(keys: _*).agg(sort_array(collect_set(valueCol)).as(as))

  /** Join-skew diagnosis: the top-N hottest join keys by the OUTPUT
    * rows they would produce (n_left × n_right) — the planning query
    * an engineer (or an advisor rule) runs before shipping a big join,
    * to decide between AQE skew-split, [[saltedJoin]], or a key-level
    * rewrite. Two keyed counts + a count-table-sized full-outer join;
    * never touches the join's payload, so diagnosing a 100 TB join
    * costs two aggregate scans. Keys absent from a side report 0 /
    * produce 0 output rows.
    */
  def joinSkewReport(left: DataFrame, right: DataFrame, key: String,
                     topN: Int = 20): DataFrame = {
    require(topN >= 1)
    val lc = left.groupBy(col(key)).agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(col(key)).agg(count(lit(1)).as("n_right"))
    lc.join(rc, Seq(key), "full_outer")
      .select(col(key),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"))
      .withColumn("n_out", col("n_left") * col("n_right"))
      .orderBy(col("n_out").desc, col(key).asc)
      .limit(topN)
  }
}
