package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bfs, Dedup, Graphs, PageRank, Similarity}

/** 100× scale-up probe — the round-8 extension of the 10× curves in
  * SCALING.md. The 10× run caught the round-2 jaccard blowup; a 100×
  * run is the cheapest way to catch the NEXT nonlinearity (candidate-
  * pair memory in the banded self-joins, CC round counts, output-
  * volume cliffs) before a cluster does.
  *
  * Method, same as ProbeScale: replicate sf0.1 documents (5 k →
  * 500 k docs) and embeddings (6 k → 600 k vectors) 100× with offset
  * ids — every document gains 99 exact twins, the hostile crawl-
  * duplication regime where duplicate clusters inflate true pair
  * outputs ~m². The graph probe replicates the supplier↔part
  * bipartite graph 100× as disjoint copies (11.8 M → 118 M undirected
  * edges; diameter unchanged — the sharded-crawl regime).
  *
  * `SPARK_GRAFT_SCALE_FACTOR` overrides the factor (default 100).
  * Replicas cache under /tmp/graft_scale<factor> keyed on existence.
  */
object ProbeScale100 {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = "/root/testdata/sf0.1"
    val big = s"/tmp/graft_scale$factor"

    def replicate(table: String, idCols: Seq[String]): Unit = {
      val out = s"$big/$table.parquet"
      if (new java.io.File(out, "_SUCCESS").exists()) return
      val src = spark.read.parquet(s"$base/$table.parquet")
      val maxIds = idCols.map(c => c -> src.agg(max(col(c))).head().getLong(0)).toMap
      // one distributed job: cross the source with a copy-index range
      // instead of a union of `factor` scans (a 100-branch union plans
      // slowly and re-lists the file 100×)
      val copies = spark.range(factor).select(col("id").as("__copy"))
      idCols.foldLeft(src.crossJoin(copies)) { (df, c) =>
          df.withColumn(c, col(c) + col("__copy") * (maxIds(c) + 1L))
        }
        .drop("__copy")
        .write.mode("overwrite").parquet(out)
    }

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-40s $dt%9.2f s  rows=$n")
      try spark.catalog.clearCache() catch { case _: Throwable => }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      catch { case _: Throwable => }
      System.gc(); Thread.sleep(200)
      dt
    }

    // SPARK_GRAFT_PROBE_SECTIONS=corpus,graph,triangles (comma list)
    // restricts which probe families run; unset = all
    val sections = sys.env.get("SPARK_GRAFT_PROBE_SECTIONS")
      .map(_.split(',').toSet)
    def section(name: String): Boolean = sections.forall(_.contains(name))

    if (section("corpus")) {
      replicate("documents", Seq("doc_id"))
      replicate("embeddings", Seq("vec_id"))
    }

    def docs(dir: String): DataFrame = spark.read.parquet(s"$dir/documents.parquet")
    def emb(dir: String): DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")

    // warm pass at 1× (codegen), then timed 1× and timed <factor>×
    (if (section("corpus"))
       Seq(base -> "warm", base -> "sf0.1", big -> s"${factor}x")
     else Seq.empty).foreach {
      case (dir, label) =>
        time(s"exactDedup     $label")(
          Dedup.exactDupGroups(docs(dir), col("doc_id"), col("text")).count())
        time(s"jaccardPairs   $label")(
          Dedup.jaccardPairs(docs(dir), "doc_id", "text", 3, 0.6, Long.MaxValue).count())
        time(s"jaccardClusters $label")(
          Dedup.jaccardClusters(docs(dir), "doc_id", "text", 3, 0.6, Long.MaxValue).count())
        time(s"minhashNearDup $label")(
          Dedup.minhashNearDups(docs(dir), "doc_id", "text", 0.6).count())
        time(s"simhashNearDup $label")(
          Dedup.simhashNearDups(docs(dir), "doc_id", "text", 8).count())
        time(s"knnJoin        $label")(
          Similarity.knnJoin(emb(dir), "vec_id", "embedding", 3, 32, 4).count())
        time(s"contamination  $label") {
          val d = docs(dir)
          Dedup.contamination(d, d.filter(col("doc_id") % 500 === 0),
            "doc_id", "text", 3, 3).count()
        }
    }

    // graph iteratives at factor×: disjoint prefix-tagged copies
    def pairs1x: DataFrame =
      spark.read.parquet(s"$base/lineitem.parquet")
        .select(concat(lit("S"), col("l_suppkey").cast("string")).as("src"),
          concat(lit("P"), col("l_partkey").cast("string")).as("dst"))
        .distinct()
    def undirected(p: DataFrame): DataFrame =
      p.union(p.select(col("dst").as("src"), col("src").as("dst")))
    def pairsNx: DataFrame = {
      val p = pairs1x
      val copies = spark.range(factor).select(col("id").as("__copy"))
      p.crossJoin(copies)
        .select(
          when(col("__copy") === 0, col("src"))
            .otherwise(concat(lit("c"), col("__copy"), col("src"))).as("src"),
          when(col("__copy") === 0, col("dst"))
            .otherwise(concat(lit("c"), col("__copy"), col("dst"))).as("dst"))
    }
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete(); ()
    }
    (if (section("graph"))
       Seq(("1x", () => pairs1x, 1), (s"${factor}x", () => pairsNx, factor))
     else Seq.empty)
      .foreach { case (tag, mk, copies) =>
        val edges = undirected(mk())
        time(s"$tag edges count") { edges.count() }
        val art = s"/tmp/graft_scalegraph100_$tag"
        deleteRec(new java.io.File(s"$art-edges"))
        deleteRec(new java.io.File(s"$art-nodes"))
        time(s"$tag pagerank cold (build+5it)") {
          PageRank.ranksFromArtifact(spark, art, edges, 5).count()
        }
        time(s"$tag pagerank warm") {
          PageRank.ranksFromArtifact(spark, art, edges, 5).count()
        }
        val seeds = (0 until math.min(copies, 100)).map(i =>
          if (i == 0) "S1" else s"c${i}S1").toDF("id")
        time(s"$tag bfs 3 hops") {
          Bfs.shortestHops(edges, seeds, maxHops = 3).count()
        }
      }

    // triangle counting at factor×: disjoint id-offset copies of the
    // co-purchase graph (q134's edge relation) ⇒ triangles must equal
    // EXACTLY factor × base — a scale curve that doubles as a
    // correctness gate on the degree-orientation algorithm
    if (section("triangles")) runTriangles(spark, base, factor)

    // BPE merge learning: replication multiplies every word count by
    // `factor` but leaves the DISTINCT-WORD state identical, so the
    // merge SEQUENCE must be bit-identical and every pair count
    // exactly factor× — a correctness gate riding on the curve (the
    // per-step agg is vocabulary-sized, so cost should be ~flat).
    if (section("bpe")) {
      replicate("documents", Seq("doc_id"))
      def mergeSeq(dir: String): Seq[(Int, String, String, Long)] =
        graft.operators.BpeLearn.learnMerges(
            spark.read.parquet(s"$dir/documents.parquet"), col("text"), 8)
          .orderBy("step").select("step", "left", "right", "pair_count")
          .collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
          .toSeq
      var m1: Seq[(Int, String, String, Long)] = Seq.empty
      var mN: Seq[(Int, String, String, Long)] = Seq.empty
      time("bpe 8 merges 1x") { m1 = mergeSeq(base); m1.size.toLong }
      time(s"bpe 8 merges ${factor}x") { mN = mergeSeq(big); mN.size.toLong }
      val sameSeq = m1.map(t => (t._1, t._2, t._3)) == mN.map(t => (t._1, t._2, t._3))
      val exactCounts = m1.size == mN.size &&
        m1.zip(mN).forall { case (a, b) => b._4 == factor * a._4 }
      println(s"[probe] bpe merge sequence identical: $sameSeq; " +
        s"counts exactly ${factor}x: $exactCounts")
    }

    spark.stop()
  }

  private def runTriangles(spark: SparkSession, base: String, factor: Int): Unit = {
    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-40s $dt%9.2f s  rows=$n")
      try spark.catalog.clearCache() catch { case _: Throwable => }
      dt
    }
    def coEdges: DataFrame = {
      val part = spark.read.parquet(s"$base/part.parquet")
        .filter(col("p_size") <= 15).select(col("p_partkey"))
      val li = spark.read.parquet(s"$base/lineitem.parquet")
        .join(part, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      Graphs.undirected(
        li.as("a").join(li.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .select(col("a.p").as("src"), col("b.p").as("dst")),
        "src", "dst")
    }
    var tri1 = 0L
    time("triangles 1x co-purchase") {
      tri1 = Graphs.triangleCount(coEdges).head().getLong(0); tri1
    }
    val maxId = coEdges.agg(max(greatest(col("u"), col("v")))).head().getLong(0)
    val offsets = spark.range(factor).select((col("id") * (maxId + 1)).as("__off"))
    var triN = 0L
    time(s"triangles ${factor}x disjoint") {
      triN = Graphs.triangleCount(
        coEdges.crossJoin(offsets)
          .select((col("u") + col("__off")).as("u"),
            (col("v") + col("__off")).as("v"))).head().getLong(0)
      triN
    }
    println(s"[probe] triangles exact ratio: ${triN == factor * tri1} " +
      s"($triN vs $factor x $tri1)")
  }
}
