package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the non-dominated point set under
  * "minimize both coordinates": p dominates q iff p.x <= q.x and
  * p.y <= q.y with at least one strict. The multi-criteria shortlist
  * query ("cheapest AND biggest", "freshest AND highest-quality")
  * that a naive encoding writes as a quadratic NOT EXISTS self-join.
  *
  * The scalable plan is ONE sort per group: ordered by (x, y), a
  * point is dominated exactly when
  *   (a) some point with x' <  x has y' <= y  — the strict-x window's
  *       running min(y) over `RANGE UNBOUNDED PRECEDING .. -1`, or
  *   (b) some point with x' <= x has y' <  y  — the inclusive
  *       window's running min(y) is strictly below y.
  * Both windows ride the same (group, x) sort; coordinates must be
  * integral (longs — fixed-point scale doubles first) so the RANGE -1
  * frame means exactly x' < x. Cost: one keyed shuffle + sort, zero
  * joins — survives any corpus the sort survives.
  *
  * Duplicate points are each non-dominated (dominance is strict), so
  * the frontier is emitted as a DISTINCT point set per group.
  *
  * Global (ungrouped) skylines must not sort the corpus on one task:
  * [[skylineGlobal]] runs the same fold per hash-salt partition first
  * (a skyline point of the whole set is a skyline point of any subset
  * containing it — local pruning is lossless), then merges the
  * salt-local frontiers — candidate-set-sized, orders of magnitude
  * smaller — in a second single-group pass.
  */
object Skyline {

  /** The one-sort dominance fold on exactly the given partitioning. */
  private def fold(pts: DataFrame, groupCols: Seq[String], x: String, y: String): DataFrame = {
    val part = Window.partitionBy(groupCols.map(col): _*).orderBy(col(x))
    val strictX = min(col(y)).over(part.rangeBetween(Window.unboundedPreceding, -1))
    val inclX = min(col(y)).over(part.rangeBetween(Window.unboundedPreceding, 0))
    pts
      .withColumn("__dom",
        coalesce(strictX <= col(y), lit(false)) || inclX < col(y))
      .filter(!col("__dom"))
      .drop("__dom")
  }

  /** Per-group Pareto frontier minimizing (x, y). Returns the
    * DISTINCT skyline points: groupCols ++ (x, y).
    *
    * Runs TWO dominance folds: first per (group, hash-salt) — a
    * lossless prefilter (a frontier point of the whole group is a
    * frontier point of any subset containing it), spreading a
    * low-cardinality group column over `salts`× more tasks — then
    * per group over the salt-local frontiers, which are candidate-
    * sized. A single-pass fold on 3 group values would sort entire
    * groups in 3 tasks; the salted prefilter is what makes the
    * few-groups skyline hold at corpus scale.
    */
  def skyline2d(df: DataFrame, groupCols: Seq[String], x: String, y: String,
                salts: Int = 32): DataFrame = {
    require(salts > 0, s"salts $salts must be positive")
    val pts = df.select((groupCols :+ x :+ y).map(col): _*)
    // duplicates ride through the first fold unharmed (peers in the
    // RANGE frames never dominate each other), and the salt keys on
    // (x, y) so copies co-locate — dedup AFTER the local fold runs on
    // frontier-sized candidates instead of the whole corpus
    val salted = pts.withColumn("__salt", pmod(xxhash64(col(x), col(y)), lit(salts)))
    val local = fold(salted, groupCols :+ "__salt", x, y).drop("__salt").distinct()
    fold(local, groupCols, x, y)
  }

  /** Global frontier: the same two-fold discipline with no group. */
  def skylineGlobal(df: DataFrame, x: String, y: String, salts: Int = 32): DataFrame =
    skyline2d(df.withColumn("__g", lit(1)), Seq("__g"), x, y, salts).drop("__g")
}
