package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tagging

/** 10× scale probe for dictionary tagging (q200), with the asserted
  * invariant riding the curve: replication clones every document
  * (ids offset, lang unchanged), so every (lang, pattern) row's
  * occurrences and docs_with_hit at 10× must be EXACTLY 10× the 1×
  * values. The operator is one automaton scan + one keyed agg, so
  * wall-clock should track corpus size ~linearly.
  * Reuses the /tmp/graft_scale10 documents replica (ProbeScale's
  * scheme).
  */
object ProbeTagging {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = "/root/testdata/sf0.1"
    val big = "/tmp/graft_scale10"

    def docs(dir: String): DataFrame = spark.read.parquet(s"$dir/documents.parquet")
    if (!new java.io.File(s"$big/documents.parquet/_SUCCESS").exists()) {
      val src = docs(base)
      val maxId = src.agg(max(col("doc_id"))).head().getLong(0)
      (0 until 10).map(i => src.withColumn("doc_id",
          col("doc_id") + lit(i.toLong * (maxId + 1))))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$big/documents.parquet")
    }

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      r
    }

    val pats = Seq("data", "data data", "the join", "spark",
      "query query", "window scan")
    def stats(dir: String): Map[(String, String), (Long, Long)] =
      Tagging.patternStats(docs(dir), "lang", col("text"), pats)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap

    val s1 = time("patternStats 1x")(stats(base))
    val s10 = time("patternStats 10x")(stats(big))
    require(s10.keySet == s1.keySet, "clone replication changed the hit key set")
    val bad = s1.filter { case (k, (occ, hits)) => s10(k) != ((occ * 10, hits * 10)) }
    require(bad.isEmpty, s"10x stats are not exactly 10x the 1x stats: $bad")
    println(s"[probe] invariant: all ${s1.size} (lang, pattern) rows exactly " +
      "10x at 10x — TRUE")

    // dictionary-width axis: the automaton's scan cost must be
    // (near-)independent of dictionary size — that is the whole point
    // vs N×contains(). 900-phrase dictionary = every 2-word pair over
    // the corpus vocabulary; the 6-pattern subset's rows must be
    // IDENTICAL under the wide dictionary (automaton output is
    // per-pattern independent).
    val vocab = docs(base)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy(col("count").desc, col("w"))
      .limit(30).collect().map(_.getString(0)).toSeq
    val wide = (for (a <- vocab; b <- vocab) yield s"$a $b").distinct
    def statsWide(dir: String, ps: Seq[String]): Map[(String, String), (Long, Long)] =
      Tagging.patternStats(docs(dir), "lang", col("text"), ps)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
    val w1 = time(s"patternStats 1x dict=${wide.size}")(statsWide(base, wide))
    time(s"patternStats 10x dict=${wide.size}")(statsWide(big, wide))
    val narrowInWide = s1.keys.filter(k => wide.contains(k._2))
    val disagree = narrowInWide.filter(k => w1.get(k) != s1.get(k))
    require(disagree.isEmpty,
      s"wide dictionary changed narrow-pattern stats: $disagree")
    println(s"[probe] invariant: ${narrowInWide.size} narrow-dict rows " +
      s"identical under the ${wide.size}-pattern dictionary — TRUE")

    // 10^5-pattern axis (round 13): TagExprs claims a blocklist-scale
    // automaton is model-sized state riding the plan — measure it:
    // automaton build time, the full scan+agg at 1× and 10×, and the
    // same narrow-dict invariance (the 6 q200 patterns ride inside
    // the 10^5 dictionary and their rows must be identical).
    // 18^4 = 104,976 four-word phrases (the corpus vocabulary is only
    // ~31 words, so triples top out near 30k)
    val v18 = docs(base)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy(col("count").desc, col("w"))
      .limit(18).collect().map(_.getString(0)).toSeq
    val huge = ((for (a <- v18; b <- v18; c <- v18; d <- v18)
      yield s"$a $b $c $d") ++ pats).distinct
    println(s"[probe] huge dictionary: ${huge.size} patterns")
    val auto = time(s"AcKernel.build dict=${huge.size}")(
      graft.functions.AcKernel.build(huge))
    println(s"[probe] automaton states: ${auto.nStates}")
    def statsHuge(dir: String): Map[(String, String), (Long, Long)] =
      Tagging.patternStats(docs(dir), "lang", col("text"), huge)
        .filter(col("pattern").isin(pats: _*))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
    val h1 = time(s"patternStats 1x dict=${huge.size}")(statsHuge(base))
    time(s"patternStats 10x dict=${huge.size}")(statsHuge(big))
    val narrowInHuge = s1.keys.filter(k => huge.contains(k._2))
    val hDisagree = narrowInHuge.filter(k => h1.get(k) != s1.get(k))
    require(hDisagree.isEmpty,
      s"10^5 dictionary changed narrow-pattern stats: $hDisagree")
    println(s"[probe] invariant: ${narrowInHuge.size} narrow-dict rows " +
      s"identical under the ${huge.size}-pattern dictionary — TRUE")
    spark.stop()
  }
}
