package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.Dedup

/** Scratch harness for plan/perf probes (not part of the library API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, "/root/testdata/sf0.1").documents

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    // warm
    Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.6).count()
    spark.catalog.clearCache()
    time("jaccardPairs #1") {
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.6).count()
    }
    time("jaccardPairs #2") {
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.6).count()
    }
    time("jaccardClusters") {
      Dedup.jaccardClusters(docs, "doc_id", "text", n = 3, threshold = 0.6).count()
    }
    time("minhashNearDups") {
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.6).count()
    }
    spark.stop()
  }
}
