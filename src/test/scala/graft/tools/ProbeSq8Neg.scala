package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** 10× scale probe for the round-12 additions, with asserted
  * invariants riding on the curves (the SCALING.md discipline):
  *  - SQ8: the per-dimension scales are max-aggregates, so replicating
  *    the corpus must leave them EXACTLY unchanged; the top-k scan is
  *    one linear pass.
  *  - negative mining: replicas are id-shifted clones, so every
  *    ORIGINAL probe's top-1 negative (nn_id, cosine) is invariant —
  *    clones tie on cosine but lose the nn_id tie-break to the
  *    original row.
  * Reuses the /tmp/graft_scale10 replicas (ProbeScale builds them).
  */
object ProbeSq8Neg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = "/root/testdata/sf0.1"
    val big = "/tmp/graft_scale10"

    def emb(dir: String): DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")
    if (!new java.io.File(s"$big/embeddings.parquet/_SUCCESS").exists()) {
      // same replication scheme as ProbeScale: ids offset per copy
      val src = emb(base)
      val maxId = src.agg(max(col("vec_id"))).head().getLong(0)
      (0 until 10).map(i => src.withColumn("vec_id",
          col("vec_id") + lit(i.toLong * (maxId + 1))))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    }

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      r
    }

    // SQ8: scales invariant under replication; top-k linear
    val s1 = time("sq8Scales 1x")(Similarity.sq8Scales(emb(base), "embedding"))
    val s10 = time("sq8Scales 10x")(Similarity.sq8Scales(emb(big), "embedding"))
    require(s1.sameElements(s10), "sq8 scales changed under clone replication")
    println("[probe] invariant: sq8 scales bit-identical at 10x — TRUE")
    time("sq8TopK 1x")(Similarity.sq8TopK(emb(base), "vec_id", "embedding", 0L, 10).count())
    time("sq8TopK 10x")(Similarity.sq8TopK(emb(big), "vec_id", "embedding", 0L, 10).count())

    // persisted tier (round 13): the code-only indexed scan vs the
    // ad-hoc float path at 10×, with bit-identity asserted. The
    // ad-hoc path pays sq8Scales + quantize + float-width I/O per
    // query; the indexed path reads the 1-byte-per-dim code column
    // only. Build cost is the amortized one-off.
    val idx = s"$big/sq8_idx"
    time("buildSq8Index 10x")(
      Similarity.ensureSq8Index(emb(big), "vec_id", "embedding", idx))
    def pairs(df: DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val adhoc = time("sq8 ad-hoc query 10x")(
      pairs(Similarity.sq8TopK(emb(big), "vec_id", "embedding", 0L, 10)))
    val indexed = time("sq8 indexed query 10x")(
      pairs(Similarity.sq8TopKIndexed(spark, idx, "vec_id", 0L, 10)))
    require(indexed == adhoc, s"indexed != ad-hoc at 10x: $indexed vs $adhoc")
    println("[probe] invariant: indexed SQ8 ranking bit-identical to ad-hoc at 10x — TRUE")

    // negative mining: per-original-probe top-1 invariant
    def top1(dir: String): Map[Long, (Long, Double)] = {
      val e = emb(dir)
      Similarity.negativeMining(
          e.filter(col("vec_id") % 100 === 0 && col("vec_id") < 12800), e,
          "vec_id", "embedding", "label", k = 1)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    }
    val n1 = time("negativeMining k=1 1x")(top1(base))
    val n10 = time("negativeMining k=1 10x")(top1(big))
    val orig = n1.keySet.filter(_ < 5000)
    val bad = orig.filter(q => n10.get(q) != n1.get(q))
    require(bad.isEmpty, s"top-1 negatives changed for original probes: $bad")
    println(s"[probe] invariant: top-1 negative identical for all ${orig.size} " +
      "original probes at 10x — TRUE")
    spark.stop()
  }
}
