package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe for the relational surface: replicate the whole
  * star schema 10× with referential integrity preserved (each copy
  * offsets every key family consistently), then run the REGISTERED
  * queries against the big dir and compare wall-times with sf0.1.
  */
object ProbeScaleRel {
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
    val factor = 10

    // events goes through Tables so the NANOS->micros conversion has
    // exactly one implementation
    def src(t: String): DataFrame =
      if (t == "events") graft.Tables(spark, base).events
      else spark.read.parquet(s"$base/$t.parquet")
    def maxOf(t: String, c: String): Long =
      src(t).agg(max(col(c))).head().getLong(0) + 1

    lazy val mo = maxOf("orders", "o_orderkey")
    lazy val mc = maxOf("customer", "c_custkey")
    lazy val mp = maxOf("part", "p_partkey")
    lazy val ms = maxOf("supplier", "s_suppkey")
    lazy val me = maxOf("events", "event_id")
    lazy val mu = maxOf("events", "user_id")
    lazy val md = maxOf("documents", "doc_id")

    // offsets passed by-name so a fully-cached run skips the max()
    // aggregation jobs entirely
    def replicate(t: String, offsets: => Map[String, Long]): Unit = {
      val out = s"$big/$t.parquet"
      if (new java.io.File(out, "_SUCCESS").exists()) return
      val s0 = src(t)
      val offs = offsets
      (0 until factor).map { i =>
        offs.foldLeft(s0) { case (df, (c, m)) =>
          df.withColumn(c, col(c) + lit(i * m))
        }
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(out)
      println(s"[probe] replicated $t")
    }

    // region/nation: copy once (dimension tables stay fixed)
    for (t <- Seq("region", "nation")) {
      val out = s"$big/$t.parquet"
      if (!new java.io.File(out, "_SUCCESS").exists())
        src(t).write.mode("overwrite").parquet(out)
    }
    replicate("customer", Map("c_custkey" -> mc))
    replicate("supplier", Map("s_suppkey" -> ms))
    replicate("part", Map("p_partkey" -> mp))
    replicate("orders", Map("o_orderkey" -> mo, "o_custkey" -> mc))
    replicate("lineitem", Map("l_orderkey" -> mo, "l_partkey" -> mp, "l_suppkey" -> ms))
    replicate("events", Map("event_id" -> me, "user_id" -> mu))
    // q46/q68 read the documents corpus; replicate it too so the 10×
    // pass runs them at true 10× instead of erroring on a missing table
    replicate("documents", Map("doc_id" -> md))

    val names = Seq(
      "q01_pricing_summary", "q07_first_order_per_cust", "q08_region_orders",
      "q16_revenue_fallback", "q19_order_rank", "q21_sessions",
      "q22_candidate_parts", "q23_related_candidates", "q43_page2",
      "q46_top_terms", "q49_kg_disease_targets", "q56_mechanism_targets",
      "q60_kg_drug_info", "q68_sequence_packing",
      // round-3 additions over the star schema / events
      "q109_funnel", "q110_cohort_retention", "q111_resample",
      "q112_histogram", "q114_transitions", "q115_edit_neardups",
      "q116_hopping", "q117_debounce", "q118_quality_audit",
      "q119_bfs_hops",
      // round-7: the temporal/behavior family whose scale story was
      // asserted (join-free union+window plan audits) but never
      // measured at 10× events
      "q74_asof_join", "q75_range_join", "q86_asof_forward",
      "q120_funnel_windowed", "q122_attribution",
      // round-10: interval algebra, skyline, profiler, tokenizers,
      // basket rules, split, MAD — the new shapes whose 10× curves
      // belong in SCALING.md
      "q167_interval_overlap", "q168_interval_merge",
      "q169_pareto_skyline", "q170_profile", "q171_unigram_learn",
      "q172_unigram_encode", "q173_basket_rules", "q174_split_assign",
      "q176_mad_outliers")

    for ((dir, label) <- Seq((base, "warm"), (base, "sf0.1"), (big, "10x"))) {
      names.foreach { n =>
        val t0 = System.nanoTime()
        try {
          graft.SparkEntry.queries(n)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          println(f"[probe] $label%-6s $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        } catch { case e: Throwable =>
          println(s"[probe] $label $n FAILED: ${e.getMessage.take(120)}")
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
