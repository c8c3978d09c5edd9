package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of declared queries to files — the
  * plan evidence the optimization rounds commit under `plans/`.
  *
  * Usage: Test/runMain graft.tools.DumpPlan <outDir> <suffix> <name...>
  * Each <name> is a registry-name prefix (q199, q216, ...); the plan
  * of the query's RETURNED DataFrame lands at
  * `<outDir>/<fullname>_<suffix>.txt`.
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlan <outDir> <suffix> <name...>")
    val outDir = args(0); val suffix = args(1)
    val prefixes = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val df = fn(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[probe] dumped $name -> $outDir/${name}_$suffix.txt")
      }
    spark.stop()
  }
}
