package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the ADAPTIVE half of the clone-contraction contract directly:
  * `Dedup.contractBy` must return no membership relation on a
  * clone-free input (so every consumer takes the expansion-free fast
  * path) and a correct one when clones exist. The end-to-end
  * output-equality of both paths is covered by the naive-equality
  * specs in DedupSpec/SimilaritySpec/BehaviorOpsSpec; this spec
  * guards the DISPATCH, which those can't observe.
  */
class ContractionSpec extends SparkSpec {
  import spark.implicits._

  test("contractBy: clone-free input yields reps only, no members relation") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "k")
    val (groups, members) = Dedup.contractBy(df, "id", "k")
    assert(members.isEmpty)
    // groups still carries every row as its own rep
    assert(groups.select("rid").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(groups.select("gsize").as[Long].collect().forall(_ == 1L))
  }

  test("contractBy: clones yield min-id reps and a full membership map") {
    val df = Seq((5L, "a"), (2L, "a"), (9L, "b"), (7L, "b"), (4L, "c"))
      .toDF("id", "k")
    val (groups, members) = Dedup.contractBy(df, "id", "k")
    assert(members.nonEmpty)
    val reps = groups.select("k", "rid").as[(String, Long)].collect().toMap
    assert(reps == Map("a" -> 2L, "b" -> 7L, "c" -> 4L))
    val mem = members.get.select("rid", "mid").as[(Long, Long)]
      .collect().toSet
    assert(mem == Set((2L, 5L), (2L, 2L), (7L, 9L), (7L, 7L), (4L, 4L)))
  }

  test("expandPairs: None members passes rep pairs through unchanged") {
    val pairs = Seq((1L, 2L, 0.9)).toDF("id_a", "id_b", "jaccard")
    val out = Dedup.expandPairs(pairs, None, lit(1.0), "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 0.9)))
  }
}
