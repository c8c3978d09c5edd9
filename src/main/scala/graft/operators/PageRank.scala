package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality (PageRank) — the graph-derived quality
  * signal a web-scale corpus pipeline attaches to documents (domain
  * authority for crawl prioritization and quality weighting; the KG
  * analogue scores entity authority from association edges).
  *
  * Reference scope: the reference ranks entities by server-computed
  * association score (opentargets.schema orderByScore); a corpus
  * engine also needs the self-computed, whole-graph version. North-
  * star extension per SURVEY.md §2.
  *
  * EXACT FIXED-POINT ARITHMETIC: ranks are BIGINTs at `scale` (1e9)
  * resolution, and every update uses only integer sum / integer
  * division — `r' = (15·(scale div N)) div 100 + (85·Σ r(u) div
  * deg(u)) div 100`. Integer addition is associative, so Spark's
  * parallel partial aggregation and a sequential engine (the DuckDB
  * oracle) produce IDENTICAL ranks after any fixed number of
  * iterations — no float-order drift, no tolerance windows. Dangling
  * mass (nodes with no out-edges) is dropped, not redistributed; the
  * oracle makes the same choice.
  *
  * Scale shape (100 TB): each iteration is one equi-join of the rank
  * relation against the (static) degree-annotated edge relation on
  * `src` plus one keyed sum on `dst` — both partial-aggregable hash
  * exchanges keyed by node id; no driver-side state (the node count
  * enters as a broadcast 1-row aggregate). The edge relation is
  * reused across iterations, so at cluster scale it should be cached
  * or bucketed by `src` once (`sources.Bucketing`) and every
  * iteration's join co-locates for free. Lineage grows linearly in
  * iterations — for the tens-of-iterations regime insert a
  * `localCheckpoint` every ~5 rounds (as `Dedup.dupClusters` does);
  * at the fixed 5 rounds registered here the plan stays shallow.
  */
object PageRank {

  /** Iterate `iters` rounds over `edges` (columns `src`, `dst`; any
    * orderable key type). Returns (`id`, `rank`) for every node that
    * appears as a source or destination. `rank` is BIGINT at `scale`
    * fixed-point resolution; ranks over all nodes sum to ~`scale`
    * (minus integer-floor and dangling loss).
    */
  def ranks(edges: DataFrame, iters: Int, scale: Long = 1000000000L,
            dampingPct: Int = 85): DataFrame = {
    // The static relations are referenced by EVERY iteration, and the
    // final plan would otherwise inline their construction DAG
    // (distinct + union + degree agg + join) once per reference —
    // measured 5× edge-DAG re-execution ≈ 4× the query's whole cost
    // at 1.2 M edges. Eager localCheckpoint materializes them once
    // and truncates the lineage (the `Dedup.dupClusters` contract);
    // at cluster scale the same role is played by a bucketed edge
    // table. The blocks are released before returning — the returned
    // ranks are themselves checkpointed, so nothing reachable still
    // references them.
    requireArgs(iters, dampingPct)
    val (edgesDeg, base) = prepare(staticGraph(edges))
    try iterate(edgesDeg, base, iters, scale, dampingPct)
    finally { edgesDeg.unpersist(); base.unpersist() }
  }

  /** Run `iters` rounds against a graph whose static relations were
    * persisted once via [[ensureGraph]] — each run reads two small
    * parquet relations instead of re-deriving distinct nodes, degrees,
    * and the degree join from the raw edges. This is the production
    * shape: the degree-annotated edge relation is the first checkpoint
    * a repeated graph computation writes (the 100 TB analogue is a
    * bucketed edge table), and every rerun — or bench rep — starts
    * from it.
    */
  def ranksFromArtifact(spark: org.apache.spark.sql.SparkSession, path: String,
                        edges: => DataFrame, iters: Int,
                        scale: Long = 1000000000L,
                        dampingPct: Int = 85): DataFrame = {
    requireArgs(iters, dampingPct)
    val (edgesDeg, base) = prepare(ensureGraph(spark, path, edges))
    try iterate(edgesDeg, base, iters, scale, dampingPct)
    finally { edgesDeg.unpersist(); base.unpersist() }
  }

  /** Validate BEFORE any materialization: prepare() runs two full
    * Spark jobs (repartition + eager localCheckpoint), and a require
    * that fires after them would leak both checkpointed block sets.
    */
  private def requireArgs(iters: Int, dampingPct: Int): Unit =
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)

  /** Build-once persisted static graph: `(src, dst, __deg)` at
    * `$path-edges` and `(id, __n)` at `$path-nodes` (published
    * atomically via [[Artifact.ensure]]). `edges` is by-name — not
    * touched when both artifacts already exist.
    */
  def ensureGraph(spark: org.apache.spark.sql.SparkSession, path: String,
                  edges: => DataFrame): (DataFrame, DataFrame) = {
    val (ep, np) = (s"$path-edges", s"$path-nodes")
    if (!Artifact.complete(ep) || !Artifact.complete(np)) {
      Artifact.ensure(ep) { tmp =>
        val e = edges
        e.join(e.groupBy(col("src")).agg(count(lit(1)).as("__deg")), "src")
          .write.mode("overwrite").parquet(tmp)
      }
      // derive nodes from the just-PUBLISHED edges parquet, not the raw
      // edge DAG: the inner degree join keeps every edge, so the
      // src∪dst node set is identical — and the raw-edge scan+shuffle
      // (the expensive half of a cold build) runs once instead of twice
      Artifact.ensure(np) { tmp =>
        val e = spark.read.parquet(ep)
        val nodes = e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id"))).distinct()
        nodes.crossJoin(broadcast(nodes.agg(count(lit(1)).as("__n"))))
          .write.mode("overwrite").parquet(tmp)
      }
    }
    (spark.read.parquet(ep), spark.read.parquet(np))
  }

  /** Derive the static relations from raw edges: the degree-annotated
    * edge relation and the node relation carrying the (constant) node
    * count as a column.
    */
  private def staticGraph(edges: DataFrame): (DataFrame, DataFrame) = {
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val edgesDeg = edges.join(outdeg, "src")
    val nRow = broadcast(nodes.agg(count(lit(1)).as("__n")))
    (edgesDeg, nodes.crossJoin(nRow))
  }

  /** Materialize the statics for the iteration loop. Checkpoint AFTER
    * repartitioning on the per-iteration join key: LocalCheckpoint
    * preserves the physical partitioning, so every iteration's
    * ranks⋈edges join shuffles only the (changing) ranks side — the
    * static edge relation never re-exchanges. This is the local
    * analogue of the bucketed edge table at cluster scale.
    */
  private def prepare(g: (DataFrame, DataFrame)): (DataFrame, DataFrame) =
    (g._1.repartition(col("src")).localCheckpoint(true),
     g._2.localCheckpoint(true))

  private def iterate(edgesDeg: DataFrame, base: DataFrame, iters: Int,
                      scale: Long, dampingPct: Int): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)
    val telePct = 100 - dampingPct
    var ranks = base.select(col("id"), expr(s"$scale DIV __n").as("rank"))
    for (_ <- 0 until iters) {
      val contrib = ranks.join(edgesDeg, col("id") === col("src"))
        .select(col("dst"), expr("rank DIV __deg").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
      ranks = base
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          expr(s"($telePct * ($scale DIV __n)) DIV 100" +
            s" + ($dampingPct * coalesce(__s, 0L)) DIV 100").as("rank"))
    }
    // 5 chained join+agg stages execute as ONE job over the
    // materialized statics (no per-iteration barrier needed at this
    // iteration count); the eager checkpoint here both truncates the
    // consumer-visible lineage and lets the statics be released.
    ranks.localCheckpoint(true)
  }
}
