package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** A/B probe: expanded (dupClusters∘jaccardPairs) vs contracted
  * (jaccardClusters) cluster resolution at bench scale. (scratch, not
  * part of the library API)
  */
object ProbeCC2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%7.2f s (n=$n)")
      spark.catalog.clearCache()
    }

    def docs(dir: String) = Tables(spark, dir).documents
    // warm both shapes at sf0.001
    Dedup.jaccardClusters(docs("/root/testdata/sf0.001"), "doc_id", "text", 3, 0.6).count()
    spark.catalog.clearCache()
    Dedup.dupClusters(Dedup.jaccardPairs(docs("/root/testdata/sf0.001"), "doc_id", "text", 3, 0.6)).count()
    spark.catalog.clearCache()

    val d = docs("/root/testdata/sf0.1")
    (1 to 3).foreach { rep =>
      time(s"contracted rep$rep")(
        Dedup.jaccardClusters(d, "doc_id", "text", 3, 0.6, Long.MaxValue).count())
      time(s"expanded   rep$rep")(
        Dedup.dupClusters(Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.6, Long.MaxValue)).count())
    }
    spark.stop()
  }
}
