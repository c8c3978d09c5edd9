package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off dump of a query's rows with double bit patterns — used to
  * verify cross-engine float identity (e.g. the q123 signed-zero
  * normalization) without a full Verify pass.
  */
object ProbeBits {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args.headOption.getOrElse("q123_correlation")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    graft.SparkEntry.queries(name)(spark, dir).collect().foreach { r =>
      val cells = (0 until r.length).map { i =>
        r.get(i) match {
          case d: java.lang.Double =>
            f"$d%s[0x${java.lang.Double.doubleToRawLongBits(d)}%x]"
          case v => String.valueOf(v)
        }
      }
      println(cells.mkString(" | "))
    }
    spark.stop()
  }
}
