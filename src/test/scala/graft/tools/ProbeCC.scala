package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Scratch probe: where does q69 (jaccard pairs → connected
  * components) spend its time at bench scale? (not part of the
  * library API)
  */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir).documents

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warm codegen on the small fixture first
    Dedup.dupClusters(Dedup.jaccardPairs(
      Tables(spark, "/root/testdata/sf0.001").documents,
      "doc_id", "text", 3, 0.6, Long.MaxValue)).count()
    spark.catalog.clearCache()

    (1 to 2).foreach { rep =>
      val pairs = time(s"rep$rep jaccardPairs build+count") {
        val p = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6, Long.MaxValue)
        println(s"[probe]   pairs rows = ${p.count()}")
        p.persist(); p.count(); p
      }
      time(s"rep$rep dupClusters") {
        Dedup.dupClusters(pairs).write.format("noop").mode("overwrite").save()
      }
      pairs.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
