package graft.tools

import org.apache.spark.sql.SparkSession

/** Where does a GraphQL-dialect row's ~0.5-1.5 s go? Decomposes one
  * representative query (q152's shape) into: KnowledgeGraph
  * construction (Tables + Artifact checks + parquet footer reads),
  * execute() plan construction, and the action — then times a batch
  * of dialect rows back-to-back to expose the per-query floor.
  */
object ProbeGql {
  def main(args: Array[String]): Unit = {
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
      println(f"[probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val gqlNames = graft.SparkEntry.queries.keys.toSeq.sorted.filter(n =>
      n.contains("graphql"))
    println(s"[probe] ${gqlNames.size} graphql rows")
    // warm every dialect row once (codegen)
    sec("warm all graphql rows") {
      gqlNames.foreach { n =>
        try noop(graft.SparkEntry.queries(n)(spark, dir))
        catch { case e: Throwable => println(s"[probe] $n FAILED: $e") }
      }
    }
    (1 to 2).foreach { rep =>
      println(s"[probe] ---- rep $rep ----")
      sec("ALL graphql rows back-to-back") {
        gqlNames.foreach(n =>
          noop(graft.SparkEntry.queries(n)(spark, dir)))
      }
      // decompose one representative
      val one = gqlNames.head
      sec(s"$one full")(noop(graft.SparkEntry.queries(one)(spark, dir)))
      // construction (KnowledgeGraph views + dialect planning) vs the
      // single action
      val df = sec(s"$one DataFrame construction only")(
        graft.SparkEntry.queries(one)(spark, dir))
      sec(s"$one action only")(noop(df))
      sec(s"$one action again (same plan)")(noop(df))
    }
    spark.stop()
  }
}
