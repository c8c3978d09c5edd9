package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** semanticDedup at 1× vs 100× (uses the cached ProbeScale100
  * embeddings replica) — the round-8 contraction's last consumer.
  */
object ProbeSemDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%9.2f s  rows=$n")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    Seq("/root/testdata/sf0.1" -> "warm", "/root/testdata/sf0.1" -> "sf0.1",
        "/tmp/graft_scale100" -> "100x").foreach { case (dir, label) =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      time(s"semanticDedup $label")(
        Similarity.semanticDedup(emb, "vec_id", "embedding", 0.35, 16).count())
    }
    spark.stop()
  }
}
