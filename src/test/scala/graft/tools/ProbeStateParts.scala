package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** How much of the stateful-streaming fixed-cost class (q136's
  * stream-stream interval join) is state-store count? The store
  * count is frozen from spark.sql.shuffle.partitions at the query's
  * first run — a stream-stream join maintains 4 stores per
  * partition, so 32 partitions = 128 HDFS-backed stores committing
  * per micro-batch for a 371-row result.
  */
object ProbeStateParts {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warm codegen once at the session's default
    graft.SparkEntry.queries("q136_stream_interval_join")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    Seq("32", "8", "4", "32").foreach { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries("q136_stream_interval_join")(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"[probe] q136 parts=$parts%3s rep$rep " +
          f"${(System.nanoTime() - t0) / 1e9}%7.2f s")
        try spark.catalog.clearCache() catch { case _: Throwable => }
        System.gc(); Thread.sleep(200)
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
