package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.PageRank

/** Scratch probe: q100 PageRank cost breakdown at sf0.1. */
object ProbePR {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      System.gc(); Thread.sleep(200)
    }
    val li = Tables(spark, "/root/testdata/sf0.1").lineitem
    val pairs = li.select(
        concat(lit("S"), col("l_suppkey").cast("string")).as("src"),
        concat(lit("P"), col("l_partkey").cast("string")).as("dst"))
      .distinct()
    val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    time("edges count") { edges.count() }
    (1 to 3).foreach { i =>
      time(s"pagerank 5 iters #$i") {
        PageRank.ranks(edges, 5).count()
      }
      time(s"pagerank 1 iter  #$i") {
        PageRank.ranks(edges, 1).count()
      }
    }
    spark.stop()
  }
}
