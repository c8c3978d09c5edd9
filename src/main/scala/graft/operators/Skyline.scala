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

  /** Per-group Pareto frontier minimizing (x, y). Returns the
    * DISTINCT skyline points: groupCols ++ (x, y).
    */
  def skyline2d(df: DataFrame, groupCols: Seq[String], x: String, y: String): DataFrame = {
    val pts = df.select((groupCols :+ x :+ y).map(col): _*).distinct()
    val part = Window.partitionBy(groupCols.map(col): _*).orderBy(col(x))
    val strictX = min(col(y)).over(part.rangeBetween(Window.unboundedPreceding, -1))
    val inclX = min(col(y)).over(part.rangeBetween(Window.unboundedPreceding, 0))
    pts
      .withColumn("__dom",
        coalesce(strictX <= col(y), lit(false)) || inclX < col(y))
      .filter(!col("__dom"))
      .drop("__dom")
  }

  /** Global frontier via salt-local pruning + candidate merge. */
  def skylineGlobal(df: DataFrame, x: String, y: String, salts: Int = 32): DataFrame = {
    require(salts > 0, s"salts $salts must be positive")
    val salted = df
      .withColumn("__salt", pmod(xxhash64(col(x), col(y)), lit(salts)))
    val local = skyline2d(salted, Seq("__salt"), x, y).drop("__salt")
    skyline2d(local.withColumn("__g", lit(1)), Seq("__g"), x, y).drop("__g")
  }
}
