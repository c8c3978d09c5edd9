package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for selected queries (plan-quality
  * audit: pushed filters, broadcast choices, codegen spans).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q02_threshold_filter", "q08_region_orders", "q22_candidate_parts",
      "q33_cosine_topk", "q21_sessions")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
