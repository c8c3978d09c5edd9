package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("every document is assigned exactly once") {
    val assigned = Packing.packGreedy(
      docs.select(col("doc_id"), TextFns.tokenCount(col("text")).as("nt")),
      col("doc_id"), col("nt"), buckets = 4, budgetTokens = 1024L)
    assert(assigned.count() == docs.count())
    assert(assigned.select("id").distinct().count() == docs.count())
  }

  test("bins respect the budget up to one-document spillover") {
    val budget = 1024L
    val assigned = Packing.packGreedy(
      docs.select(col("doc_id"), TextFns.tokenCount(col("text")).as("nt")),
      col("doc_id"), col("nt"), buckets = 4, budgetTokens = budget)
    val maxDoc = assigned.agg(max("n_tokens")).as[Long].head()
    val overfull = assigned.groupBy("bucket", "bin")
      .agg(sum("n_tokens").as("s"))
      .filter(col("s") > budget + maxDoc)
      .count()
    assert(overfull == 0, s"bins exceed budget+maxDoc ($budget+$maxDoc)")
    // bins are contiguous within each bucket: 0..maxBin all present
    val holes = assigned.groupBy("bucket")
      .agg(max("bin").as("mx"), countDistinct("bin").as("nb"))
      .filter(col("nb") =!= col("mx") + 1).count()
    assert(holes == 0, "bin ids are not contiguous")
  }

  test("assignment is deterministic across partitionings") {
    def run(parts: Int) = Packing.packGreedy(
      docs.repartition(parts)
        .select(col("doc_id"), TextFns.tokenCount(col("text")).as("nt")),
      col("doc_id"), col("nt"), buckets = 4, budgetTokens = 1024L)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(run(2) == run(7))
  }
}
