package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query attribution of driver-log WARNs: runs every registered
  * query at sf0.001 with a marker line before each, so `grep -B` on
  * the captured log assigns any WindowExec / scale-shape warning to
  * the query that produced it. Diagnostic harness for keeping the
  * bench tail free of single-partition-window warnings.
  */
object ProbeWarnScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      // markers go to stderr (flushed) so they interleave in order
      // with log4j's stderr appender in a combined 2>&1 capture
      Console.err.println(s"[q] $n"); Console.err.flush()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        Console.err.println(s"[q] $n ERR ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    spark.stop()
  }
}
