package graft.tools

import org.apache.spark.sql.SparkSession

/** Hypothesis probe for the streaming-replay rows (q199 family): how
  * much of the per-trigger cost is relational shuffle width (session
  * 32) over a tiny micro-batch? Runs the q199 4-trigger replay with
  * the session width forced to PROBE_W (default 1) and compares
  * against the 32-width number from ProbeQ199.
  */
object ProbeTrigW {
  def main(args: Array[String]): Unit = {
    val w = sys.env.getOrElse("PROBE_W", "1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", w)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def sec[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // ensure the backlog fixture exists (warm run not needed — build
    // it directly through the registry once, untimed)
    sec("warm full q199")(
      graft.SparkEntry.queries("q199_stream_neardups")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    val backlog = {
      val tmpdir = new java.io.File(System.getProperty("java.io.tmpdir"))
      tmpdir.listFiles().filter(_.getName.startsWith("graft_postsrc_"))
        .sortBy(-_.lastModified()).head.getPath
    }
    val bschema = spark.read.parquet(backlog).schema
    (1 to 2).foreach { rep =>
      println(s"[probe] ---- rep $rep (width=$w) ----")
      val scratch = java.nio.file.Files
        .createTempDirectory("probe_trigw").toString
      val docsStream = spark.readStream.schema(bschema)
        .option("maxFilesPerTrigger", 1).parquet(backlog)
      sec("stream replay (4 triggers)") {
        val query = graft.streaming.StreamOps.neardupSink(docsStream,
          s"$scratch/state", "doc_id", "text", s"$scratch/ckpt",
          Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()),
          threshold = 0.6, shingleN = 3)
        query.awaitTermination()
      }
      try spark.catalog.clearCache() catch { case _: Throwable => }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      catch { case _: Throwable => }
      System.gc(); Thread.sleep(200)
    }
    spark.stop()
  }
}
