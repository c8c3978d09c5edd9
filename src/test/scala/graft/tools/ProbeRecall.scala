package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch: measure banded-KNN recall against the exact audit sample
  * at each SF, to ground the q36/q88 envelope floors.
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").appName("probe-recall")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      // q36 shape
      val ann = Similarity.knnJoin(emb, "vec_id", "embedding", k = 3,
        numBits = 64, bands = 8)
      val exact = Similarity.bruteTopKBatch(
        emb.filter(col("vec_id") % 50 === 0), emb, "vec_id", "embedding", 3)
      val annS = ann.filter(col("id") % 50 === 0)
        .select(col("id").as("query_id"), col("nn_id"), lit(1).as("__hit"))
      val m = exact.select(col("query_id"), col("nn_id"))
        .join(annS, Seq("query_id", "nn_id"), "left")
        .agg(sum(coalesce(col("__hit"), lit(0))).as("hits"),
          count(lit(1)).as("total")).head()
      println(s"[probe] sf$sf q36 hits=${m.getLong(0)} total=${m.getLong(1)}")
      // q88 shape
      val probes = emb.filter(col("vec_id") % 100 === 0)
      val corpus = emb.filter(col("vec_id") % 100 =!= 0)
      val ann2 = Similarity.crossKnnJoin(probes, corpus, "vec_id", "embedding",
        k = 3, numBits = 64, bands = 8)
      val exact2 = Similarity.bruteTopKBatch(probes, corpus, "vec_id", "embedding", 3)
      val m2 = exact2.select(col("query_id"), col("nn_id"))
        .join(ann2.select(col("query_id"), col("nn_id"), lit(1).as("__hit")),
          Seq("query_id", "nn_id"), "left")
        .agg(sum(coalesce(col("__hit"), lit(0))).as("hits"),
          count(lit(1)).as("total")).head()
      println(s"[probe] sf$sf q88 hits=${m2.getLong(0)} total=${m2.getLong(1)}")
    }
    spark.stop()
  }
}
