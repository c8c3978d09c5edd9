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
  *
  * Each round's frontier is EAGERLY localCheckpoint'ed: frontier h
  * feeds both round h+1's expansion AND the final union, and the
  * visited set it anti-joins is itself a union of earlier frontiers —
  * left lazy, the shared subtrees re-execute ~2^h times (measured:
  * 24 s → 3 s at sf0.1 for 3 hops). The blocks are parameter-sized
  * (frontier rows only) and released before returning; the returned
  * relation is checkpointed, so nothing reachable references them —
  * the `PageRank.ranks` contract.
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
    // checkpoint pre-partitioned on src (the per-round join key):
    // LocalCheckpoint preserves physical partitioning, so each round
    // shuffles only the frontier side — the PageRank.ranks pattern
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint(true)
    val retained = scala.collection.mutable.ListBuffer[DataFrame](e)
    var visited = sources.select(col("id")).distinct()
      .withColumn("hops", lit(0)).localCheckpoint(true)
    retained += visited
    var frontier = visited.select(col("id"))
    for (h <- 1 to maxHops) {
      frontier = frontier
        .join(e, frontier("id") === e("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(true)
      retained += frontier
      visited = visited.unionByName(frontier.withColumn("hops", lit(h)))
    }
    val out = visited.localCheckpoint(true)
    retained.foreach(_.unpersist())
    out
  }
}
