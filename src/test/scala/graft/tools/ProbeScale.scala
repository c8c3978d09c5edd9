package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Scale-up probe: replicate the sf0.1 tables 10× (ids offset so keys
  * stay unique) into /tmp and measure how the heavy operators scale —
  * evidence for the "would this survive 100×" question. A near-linear
  * operator should show ~10× wall time at 10× data on fixed cores.
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = "/root/testdata/sf0.1"
    val big = "/tmp/graft_scale10"

    def replicate(table: String, idCols: Seq[String], factor: Int): Unit = {
      val out = s"$big/$table.parquet"
      if (new java.io.File(out, "_SUCCESS").exists()) return
      val src = spark.read.parquet(s"$base/$table.parquet")
      val maxIds = idCols.map(c => c -> src.agg(max(col(c))).head().getLong(0)).toMap
      val copies = (0 until factor).map { i =>
        idCols.foldLeft(src) { (df, c) =>
          df.withColumn(c, col(c) + lit(i.toLong * (maxIds(c) + 1)))
        }
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(out)
    }

    replicate("documents", Seq("doc_id"), 10)
    replicate("embeddings", Seq("vec_id"), 10)

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name: $dt%.2f s (n=$n)")
      spark.catalog.clearCache()
      dt
    }

    def docs(dir: String): DataFrame = spark.read.parquet(s"$dir/documents.parquet")
    def emb(dir: String): DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")

    // warm codegen on the small side first
    Seq(base, base, big).zip(Seq("warm", "sf0.1", "sf1-ish (10x)")).foreach {
      case (dir, label) =>
        time(s"jaccardPairs   $label")(
          Dedup.jaccardPairs(docs(dir), "doc_id", "text", 3, 0.6, Long.MaxValue).count())
        time(s"minhashNearDup $label")(
          Dedup.minhashNearDups(docs(dir), "doc_id", "text", 0.6).count())
        time(s"simhashNearDup $label")(
          Dedup.simhashNearDups(docs(dir), "doc_id", "text", 8).count())
        time(s"exactDedup     $label")(
          Dedup.exactDupGroups(docs(dir), col("doc_id"), col("text")).count())
        time(s"knnJoin        $label")(
          Similarity.knnJoin(emb(dir), "vec_id", "embedding", 3, 32, 4).count())
        time(s"contamination  $label") {
          val d = docs(dir)
          Dedup.contamination(d, d.filter(col("doc_id") % 500 === 0),
            "doc_id", "text", 3, 3).count()
        }
    }
    spark.stop()
  }
}
