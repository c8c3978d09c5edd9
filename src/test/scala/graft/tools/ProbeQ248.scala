package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.StreamOps

/** Stage decomposition of q248 (streaming semantic dedup) at sf0.1 —
  * the board's second-heaviest row (~15-18 s). Attributes the cost to
  * its four stages so the expensive one is a measured fact, not a
  * guess (the ProbeQ199 discipline):
  *
  *   1. centroid planning pass (16-cell Lloyd over the corpus)
  *   2. the 4-trigger AvailableNow replay (assign + archive probe +
  *      two generation writes per trigger)
  *   3. the composition verification — the frozen-centroid BATCH
  *      device recomputed over everything ingested + two except
  *      counts (the invariant the oracle pins TRUE)
  *   4. the per-batch accounting aggregates (the served rows)
  */
object ProbeQ248 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
      r
    }
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(); ()
    }

    val base = "/root/testdata/sf0.1"
    val scratch = "/tmp/graft_probe_q248"
    deleteRec(new java.io.File(scratch))

    // the q248 backlog: three corpus terciles + a clone batch
    val src = s"$scratch/backlog"
    val e = spark.read.parquet(s"$base/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val bounds = e.agg(min(col("vec_id")), max(col("vec_id"))).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    def land(df: org.apache.spark.sql.DataFrame, b: Int): Unit = {
      val part = s"$src/_b$b"
      df.coalesce(1).write.mode("overwrite").parquet(part)
      val f = new java.io.File(part).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(src, s"b$b.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - 3600000L + b * 2000L)
      deleteRec(new java.io.File(part))
    }
    time("backlog build (setup, artifact-cached in q248)") {
      (1 to 3).foreach { b =>
        land(e.filter((floor((col("vec_id") - lit(lo)) * lit(3)
          / lit(hi - lo + 1)) + lit(1)).cast("int") === b), b)
      }
      land(e.filter(col("vec_id") % 8 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          col("embedding")), 4)
    }

    (1 to 2).foreach { rep =>
      val state = s"$scratch/state$rep"
      val corpus = spark.read.parquet(src)
      time(s"rep$rep: centroid planning pass (16-cell Lloyd)") {
        Similarity.initSemanticCentroids(corpus, "vec_id", "embedding",
          nlist = 16, state)
      }
      val schema = corpus.schema
      time(s"rep$rep: 4-trigger AvailableNow replay") {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
        val q = StreamOps.semanticDedupSink(stream, state, "vec_id",
          "embedding", s"$scratch/ckpt$rep",
          Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()),
          tau = 0.35)
        q.awaitTermination()
      }
      time(s"rep$rep: composition check (fused full-outer probe)") {
        val kept = spark.read.parquet(s"$state/kept").select(col("vec_id"))
        val cents = Similarity.readCentroids(spark, state)
        val want = Similarity.semanticDedupFrozen(corpus, "vec_id",
          "embedding", tau = 0.35, cents).select(col("vec_id"))
        val ok = kept.withColumn("__k", lit(1))
          .join(want.withColumn("__w", lit(1)), Seq("vec_id"), "full_outer")
          .filter(col("__k").isNull || col("__w").isNull)
          .isEmpty
        require(ok, "composition broken")
      }
      time(s"rep$rep: accounting aggregates (served rows)") {
        spark.read.parquet(s"$state/vecs")
          .groupBy(col("batch")).agg(count(lit(1))).collect()
        spark.read.parquet(s"$state/kept")
          .filter(col("vec_id") >= 1000000L).count()
      }
    }
    println("PROBE_Q248_EXIT=0")
    spark.stop()
  }
}
