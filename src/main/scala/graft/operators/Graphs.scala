package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected graph — the classic cohesion
  * statistic (clustering coefficients, community density, spam/bot
  * subgraph detection) completing the graph family alongside PageRank
  * (importance), connected components (equivalence), and BFS
  * (reachability). The reference's KG is entity tables; triangles are
  * the simplest "how clubby is this neighborhood" question a user
  * asks of it (e.g. supplier co-supply cliques).
  *
  * Algorithm: DEGREE-ORDERED ORIENTATION (the MapReduce-era standard
  * from Suri & Vassilvitskii's "Counting Triangles and the Curse of
  * the Last Reducer", WWW'11). Each undirected edge is stored once,
  * directed from its lower-(degree, id) endpoint to the higher one;
  * every triangle then has exactly ONE node with two out-edges in
  * this orientation, so
  *     triangles = |wedges (v ← u → w) with an oriented edge v → w|
  * counted by one self-join on the wedge apex plus one semi-join of
  * the wedge list against the oriented edges.
  *
  * Scale shape: orientation bounds every out-degree by O(√m) on any
  * graph (a node of degree d > √m has < √m neighbors of equal-or-
  * higher degree... its out-edges go only to HIGHER-ranked nodes, of
  * which high-degree nodes number ≤ 2m/d < 2√m), so the wedge
  * relation is O(m^1.5) worst-case instead of Σd² — the hub that
  * explodes a naive neighbor self-join (degree 10⁶ ⇒ 10¹² wedges)
  * contributes almost nothing as a wedge apex. All three shuffles key
  * on node ids; no driver-side state.
  */
object Graphs {

  /** Canonical undirected edge relation from a possibly-directed,
    * possibly-duplicated input: one (u, v) row per unordered pair,
    * u < v, self-loops dropped (a self-loop is in no triangle).
    */
  def undirected(edges: DataFrame, src: String, dst: String): DataFrame =
    edges.select(least(col(src), col(dst)).as("u"),
        greatest(col(src), col(dst)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Degrees over the canonical edge list: (n, d). */
  private def degrees(edges: DataFrame): DataFrame =
    edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))

  /** One row (apex, x, y) per triangle, apex = the unique corner with
    * two out-edges under the degree orientation.
    */
  private def closedWedges(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    // orient each edge from lower (degree, id) to higher (degree, id)
    // — the total order that gives the √m out-degree bound
    val withDeg = edges
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("s"), col("v").as("t")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    // wedges at each apex: pairs of out-neighbors (ordered once, not
    // twice — x < y under any consistent order; out-neighbor sets are
    // duplicate-free)
    val wedges = oriented.as("a").join(oriented.as("b"),
        col("a.s") === col("b.s") && col("a.t") < col("b.t"))
      .select(col("a.s").as("apex"), col("a.t").as("x"), col("b.t").as("y"))
    // a wedge closes iff (x, y) is an edge in EITHER direction (both
    // endpoints outrank the apex, their relative orientation is
    // unknown) — normalize to canonical u < v and semi-join
    wedges
      .withColumn("u", least(col("x"), col("y")))
      .withColumn("v", greatest(col("x"), col("y")))
      .join(edges, Seq("u", "v"), "left_semi")
      .select(col("apex"), col("x"), col("y"))
  }

  /** @param edges undirected canonical edges (u, v), u < v, distinct
    *              ([[undirected]] produces this shape)
    * @return single row (triangles: Long)
    */
  def triangleCount(edges: DataFrame): DataFrame =
    closedWedges(edges).agg(count(lit(1)).as("triangles"))

  /** Per-node triangle participation and local clustering coefficient
    * C(n) = 2·T(n) / (d(n)·(d(n)−1)) — "how close is this node's
    * neighborhood to a clique" (community density, spam-ring and
    * boilerplate-hub detection on link graphs). Every triangle
    * credits ALL THREE corners (one explode of the closed-wedge
    * relation + a keyed count); nodes in no triangle get 0, degree-1
    * nodes get coefficient 0 by convention. Same shuffles as
    * [[triangleCount]] plus one corner agg keyed on node id.
    */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val tri = closedWedges(edges)
      .select(explode(array(col("apex"), col("x"), col("y"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("triangles"))
    degrees(edges).join(tri, Seq("n"), "left")
      .select(col("n").as("node"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("d") >= 2,
          round(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("d") * (col("d") - 1)), 6))
          .otherwise(lit(0.0)).as("coeff"))
  }
}
