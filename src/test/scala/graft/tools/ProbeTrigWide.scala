package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The trigger-width clamp's WIDE path, exercised (round-17 verdict
  * item 7): at bench SF every micro-batch reads ONE split, so
  * `withTriggerWidth`'s claim that a multi-split batch keeps a wide
  * shuffle is otherwise unmeasured. Builds a 10× document corpus,
  * lands it as a backlog where every trigger reads `PROBE_SPLITS`
  * parquet files (= that many input splits), replays the q199
  * near-dup sink over it, and records every completed stage's task
  * count during the replay. Evidence: the trigger stages run at the
  * split count (neither collapsed to 1 nor exploded to the session
  * width), and the per-trigger wall scales with data, not with
  * near-empty tasks.
  */
object ProbeTrigWide {
  def main(args: Array[String]): Unit = {
    val filesPerTrigger = sys.env.getOrElse("PROBE_SPLITS", "8").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(); ()
    }
    val scratch = "/tmp/graft_probe_trigwide"
    deleteRec(new java.io.File(scratch))

    // 10× corpus: replicate documents under distinct ids
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val reps = 10
    val docs10 = (0 until reps).map(r =>
        docs0.select((col("doc_id") * reps + r).as("doc_id"), col("text")))
      .reduce(_.unionByName(_))

    // backlog: 2 logical batches × filesPerTrigger files each, mtimes
    // grouped so maxFilesPerTrigger groups them back into 2 triggers
    val src = s"$scratch/backlog"
    sec(s"backlog build (10x docs, ${2 * filesPerTrigger} files)") {
      (0 until 2).foreach { b =>
        val part = s"$scratch/_b$b"
        docs10.filter(pmod(col("doc_id"), lit(2)) === b)
          .repartition(filesPerTrigger)
          .write.mode("overwrite").parquet(part)
        val files = new java.io.File(part).listFiles()
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        new java.io.File(src).mkdirs()
        files.zipWithIndex.foreach { case (f, i) =>
          val dst = new java.io.File(src, f"b$b%d_$i%03d.parquet")
          java.nio.file.Files.move(f.toPath, dst.toPath)
          dst.setLastModified(
            System.currentTimeMillis() - 3600000L + b * 60000L + i)
          ()
        }
        deleteRec(new java.io.File(part))
      }
    }

    // stage-width recorder, armed only around the replay
    val widths = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    @volatile var armed = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (armed) { widths.add(s.stageInfo.numTasks); () }
    })

    val bschema = spark.read.parquet(src).schema
    (1 to 2).foreach { rep =>
      println(s"[probe] ---- rep $rep (splits/trigger=$filesPerTrigger) ----")
      val st = java.nio.file.Files
        .createTempDirectory("probe_trigwide").toString
      val docsStream = spark.readStream.schema(bschema)
        .option("maxFilesPerTrigger", filesPerTrigger).parquet(src)
      widths.clear(); armed = true
      sec("stream replay (2 wide triggers)") {
        val query = graft.streaming.StreamOps.neardupSink(docsStream,
          s"$st/state", "doc_id", "text", s"$st/ckpt",
          Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()),
          threshold = 0.6, shingleN = 3)
        query.awaitTermination()
      }
      armed = false
      import scala.jdk.CollectionConverters._
      val hist = widths.asScala.toSeq.groupBy(identity)
        .map { case (w, xs) => w -> xs.size }.toSeq.sortBy(_._1)
      println(s"[probe] stage task-count histogram: " +
        hist.map { case (w, n) => s"$w tasks x$n" }.mkString(", "))
      // state generations land at the trigger's split count
      Seq("pairs", "shingles", "bands").foreach { rel =>
        val files = new java.io.File(s"$st/state/$rel").listFiles()
          .filter(_.isDirectory).map(d =>
            d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        println(s"[probe] $rel generation file counts: ${files.mkString(", ")}")
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
