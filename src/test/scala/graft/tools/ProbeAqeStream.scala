package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Is AQE active for derived relations inside foreachBatch? The
  * answer decides whether per-trigger state maintenance pays fixed
  * 32-partition exchanges on quarter-corpus batches.
  */
object ProbeAqeStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("aqeprobe").toString
    spark.range(1000).selectExpr("id", "id % 7 as k")
      .write.parquet(s"$dir/src")
    val st = spark.readStream.schema("id LONG, k LONG")
      .parquet(s"$dir/src")
    val q = st.writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val agg = batch.groupBy("k").count()
        agg.write.mode("overwrite").parquet(s"$dir/out")
        println(s"[probe] bid=$bid executedPlan head: " +
          agg.queryExecution.executedPlan.getClass.getSimpleName)
        val files = new java.io.File(s"$dir/out").listFiles()
          .count(_.getName.endsWith(".parquet"))
        println(s"[probe] bid=$bid out files: $files")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // batch-context control
    val agg2 = spark.read.parquet(s"$dir/src").groupBy("k").count()
    agg2.write.mode("overwrite").parquet(s"$dir/out2")
    println("[probe] batch control plan head: " +
      agg2.queryExecution.executedPlan.getClass.getSimpleName)
    println("[probe] batch control files: " +
      new java.io.File(s"$dir/out2").listFiles()
        .count(_.getName.endsWith(".parquet")))
    spark.stop()
  }
}
