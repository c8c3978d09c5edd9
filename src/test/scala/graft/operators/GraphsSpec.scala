package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Triangle counting: closed-form cases, input normalization, and
  * equality against the naive three-way join on a pseudo-random graph
  * (the oracle shape q134 uses in DuckDB).
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def tri(edges: DataFrame): Long =
    Graphs.triangleCount(edges).head().getLong(0)

  private def edgeDf(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.toDF("src", "dst")

  test("complete graph K5 has C(5,3) = 10 triangles; a star has none") {
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    assert(tri(Graphs.undirected(edgeDf(k5), "src", "dst")) == 10L)
    val star = (2L to 9L).map(b => (1L, b))
    assert(tri(Graphs.undirected(edgeDf(star), "src", "dst")) == 0L)
  }

  test("undirected normalizes direction, duplicates, and self-loops") {
    // triangle 1-2-3 given with mixed directions, a duplicate edge,
    // and a self-loop — still exactly one triangle
    val messy = Seq((1L, 2L), (2L, 1L), (3L, 2L), (1L, 3L), (3L, 3L))
    assert(tri(Graphs.undirected(edgeDf(messy), "src", "dst")) == 1L)
  }

  test("clusteringCoefficients: closed forms on K4-plus-pendant") {
    // K4 on 1-4 (every node: 3 triangles, coeff 1.0) plus pendant 5
    // attached to 1 (degree-1 ⇒ coeff 0; node 1's degree rises to 4
    // ⇒ coeff 3/C(4,2) = 0.5)
    val k4p = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L))
    val out = Graphs.clusteringCoefficients(
        Graphs.undirected(edgeDf(k4p), "src", "dst"))
      .orderBy("node")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 0.5), (2L, 3L, 1.0), (3L, 3L, 1.0),
      (4L, 3L, 1.0), (5L, 0L, 0.0)))
  }

  test("clusteringCoefficients: corner sum is 3x the triangle count") {
    val pairs = for {
      a <- 1L to 40L; b <- (a + 1) to 40L
      if ((a * 977L + b * 131L) >>> 3) % 4 == 0
    } yield (a, b)
    val edges = Graphs.undirected(edgeDf(pairs), "src", "dst")
    val perNode = Graphs.clusteringCoefficients(edges)
      .agg(sum(col("triangles"))).head().getLong(0)
    assert(perNode == 3L * tri(edges))
  }

  test("matches the naive three-way join on a pseudo-random graph") {
    // deterministic pseudo-random graph on 60 nodes: edge (a, b) iff
    // hash parity condition — dense enough for hundreds of triangles
    val n = 60L
    val pairs = for {
      a <- 1L to n; b <- (a + 1) to n
      if ((a * 2654435761L + b * 40503L) >>> 7) % 5 < 2
    } yield (a, b)
    val edges = Graphs.undirected(edgeDf(pairs), "src", "dst")
    val naive = edges.as("e1")
      .join(edges.as("e2"), col("e2.u") === col("e1.u") && col("e2.v") > col("e1.v"))
      .join(edges.as("e3"), col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
      .count()
    assert(naive > 100L, s"graph too sparse for a meaningful check: $naive")
    assert(tri(edges) == naive)
  }
}
