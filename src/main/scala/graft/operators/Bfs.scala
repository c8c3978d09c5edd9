package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS shortest hop counts — "everything within k hops
  * of these nodes" (blast-radius queries over the KG: diseases within
  * two association hops of a target; domains within k link hops of a
  * seed set). Completes the graph family: PageRank (global
  * importance), connected components (equivalence classes), BFS
  * (reachability with distance).
  *
  * Frontier iteration: each round expands the CURRENT frontier across
  * the edge relation (one equi-join on `src`), dedups the expansion,
  * and anti-joins the visited set so every node is labeled with its
  * FIRST (= minimum) hop distance. All shuffles key on the node id;
  * the visited relation grows monotonically and is the only state.
  * At the registered k ≤ 4 the union lineage stays shallow; for the
  * tens-of-hops regime insert a `localCheckpoint` every ~5 rounds
  * exactly as `Dedup.dupClusters` does.
  */
object Bfs {

  /** @param edges   (src, dst) directed edge relation
    * @param sources relation with an `id` column — hop-0 seeds
    * @return (id, hops) for every node reachable within `maxHops`,
    *         hops = minimum distance from any seed
    */
  def shortestHops(edges: DataFrame, sources: DataFrame,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    var visited = sources.select(col("id")).distinct()
      .withColumn("hops", lit(0))
    var frontier = visited.select(col("id"))
    for (h <- 1 to maxHops) {
      frontier = frontier
        .join(edges, frontier("id") === edges("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
      visited = visited.unionByName(
        frontier.withColumn("hops", lit(h)))
    }
    visited
  }
}
