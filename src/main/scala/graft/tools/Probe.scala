package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns
import graft.operators.Dedup

/** Scratch harness for plan/perf probes (not part of the library API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, "/root/testdata/sf0.01").documents

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("shingles only") {
      docs.select(col("doc_id"),
        TextFns.wordShingles(TextFns.tokens(TextFns.normText(col("text"))), 3).as("sh"))
        .agg(sum(size(col("sh")))).count()
    }
    time("minhash sig (agg)") {
      Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
        .agg(sum(size(col("sig")))).count()
    }
    time("minhash candidates") {
      Dedup.minhashCandidates(
        Dedup.minhashSignatures(docs, col("doc_id"), col("text"))).count()
    }
    time("minhash full") {
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.6).count()
    }
    time("jaccard pairs") {
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.6,
        maxShingleFreq = Long.MaxValue).count()
    }
    time("q03 search_rank") {
      graft.SparkEntry.queries("q03_search_rank")(spark, "/root/testdata/sf0.01").count()
    }
    time("q03 again") {
      graft.SparkEntry.queries("q03_search_rank")(spark, "/root/testdata/sf0.01").count()
    }
    time("q21 sessions") {
      graft.SparkEntry.queries("q21_sessions")(spark, "/root/testdata/sf0.01").count()
    }
    spark.stop()
  }
}
