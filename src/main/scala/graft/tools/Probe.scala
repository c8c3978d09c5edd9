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
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, "/root/testdata/sf0.1").documents

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      System.gc(); Thread.sleep(200)
    }
    // A/B the CC step alone on the SAME cached pair relation, so host
    // steal hits both arms equally within a run.
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.6, maxShingleFreq = Long.MaxValue)
      .select("id_a", "id_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] pairs=${pairs.count()}")
    // warm both paths (codegen)
    Dedup.dupClusters(pairs).count()
    Dedup.dupClusters(pairs, localSolveMaxEdges = 0L).count()
    System.gc(); Thread.sleep(200)
    (1 to 3).foreach { i =>
      time(s"dupClusters local #$i") { Dedup.dupClusters(pairs).count() }
      time(s"dupClusters loop  #$i") {
        Dedup.dupClusters(pairs, localSolveMaxEdges = 0L).count()
      }
    }
    spark.stop()
  }
}
