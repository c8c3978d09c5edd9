package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, Chunking, Dedup, Mixing, Quantize, RangeJoin, TextMetrics}

/** 10× scale-up probe for the round-3 operators (temporal joins,
  * repetition metrics, mixing, chunking, quantization, contracted
  * cluster resolution) — same method as ProbeScale: replicate sf0.1
  * tables 10× with offset ids, compare wall time at fixed cores.
  *
  * The headline comparison is contracted vs expanded cluster
  * resolution on the duplicate-heavy replica: every document gains 9
  * exact twins, so the expanded member-pair relation blows up
  * quadratically per cluster while the contracted graph stays at one
  * node per unique text.
  */
object ProbeScale3 {
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
    // offsetting user_id scales KEY COUNT (the cluster regime) rather
    // than rows-per-key; event_id stays globally unique
    replicate("events", Seq("event_id", "user_id"), 10)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      spark.catalog.clearCache()
    }

    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
    def emb(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")
    // ts is raw ns longs under nanosAsLong for the base tables, but a
    // cached replica may have been written with converted timestamps
    // (ProbeScaleRel) — handle both; seconds-as-double is plenty for
    // a perf probe
    def ev(dir: String) = {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val tsec = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          (col("ts") / lit(1e9)).cast("double")
        case _ => col("ts").cast("double")
      }
      raw.withColumn("tsec", tsec)
    }

    val passes =
      if (args.contains("10x-only")) Seq(base -> "warm", big -> "10x")
      else Seq(base -> "warm", base -> "sf0.1", big -> "10x")
    passes.foreach { case (dir, label) =>
      time(s"asofBackward   $label") {
        val e = ev(dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("tsec"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("tsec"), col("event_id").as("p_id"))
        AsofJoin.asofBackward(clicks, purchases, "user_id", "tsec", "tsec",
          Seq("p_id")).count()
      }
      time(s"rangeJoin      $label") {
        val e = ev(dir)
        val errors = e.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("tsec").as("v"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("tsec").as("pv"), col("event_id").as("cid"))
        RangeJoin.trailingWindowJoin(errors, clicks, "user_id", "v", "pv",
          300.0, Seq("cid")).count()
      }
      time(s"repetition     $label")(
        TextMetrics.ngramRepetition(docs(dir), "doc_id", col("text"), 2).count())
      time(s"domainMix      $label")(
        Mixing.domainMix(docs(dir), col("doc_id"), col("source"),
          (0 until 20).map(i => s"src$i" -> ((i % 4) * 4 + 4)).toMap).count())
      time(s"slidingChunks  $label")(
        Chunking.slidingChunks(docs(dir), "doc_id", col("text"), 64, 32).count())
      time(s"int8Report     $label")(
        Quantize.int8Report(emb(dir), "label", "embedding").count())
      time(s"clusters-contracted $label")(
        Dedup.jaccardClusters(docs(dir), "doc_id", "text", 3, 0.6).count())
      if (dir == big) // only meaningful (and affordable) at 10×
        time(s"clusters-EXPANDED   $label")(
          Dedup.dupClusters(
            Dedup.jaccardPairs(docs(dir), "doc_id", "text", 3, 0.6)).count())
    }
    spark.stop()
  }
}
