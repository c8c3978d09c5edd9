package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.RelOps._

/** The reference's two repurposing pipelines re-expressed on the
  * harness star schema (SURVEY.md §3.1/§3.2 → §7.2 mapping:
  * disease ≈ customer segment, target ≈ supplier, drug ≈ part).
  * Where the reference issues one HTTP request per row and dedups
  * with Python sets, each pipeline here is ONE declarative DAG —
  * fan-outs are joins, set ops are semi/anti joins, and every
  * keep-first has an explicit deterministic order.
  */
object Repurpose {

  /** Fact view: lineitem ⋈ orders ⋈ customer — the "association
    * edges" all pipelines fan out over. At cluster scale this is the
    * one big shuffle; the pipelines below reuse it so AQE can reuse
    * the exchange.
    */
  private def lineFacts(t: Tables): DataFrame =
    t.lineitem.select(col("l_orderkey").as("o_orderkey"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")), Seq("o_orderkey"))
      .join(t.customer.select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        Seq("o_custkey"))

  /** §3.1 `candidate_drugs.py::main` analogue
    * (/root/reference/candidate_drugs.py:85-164):
    *   disease  := customer segment                    (search hit)
    *   targets  := suppliers on its qty >= minQty lines (score filter)
    *   D_T_D    := parts those suppliers ship to anyone
    *   D_D      := parts the segment already buys
    *   candidates := D_T_D − D_D                        (the money op)
    * Output: candidate part id + name, deterministic order.
    */
  def candidateParts(spark: SparkSession, dir: String,
                     segment: String = "BUILDING",
                     minQty: Double = 45.0): DataFrame = {
    val t = Tables(spark, dir)
    // ONE pass over the fact join, aggregated to (part, supplier)
    // grain with the two flags every later step needs — instead of
    // re-scanning lineitem for each set (Catalyst does not share
    // common subtrees across DAG branches, so the naive three-branch
    // form scans/joins the fact table three times; this form does it
    // once and every set op below runs on the tiny aggregate).
    val pairFlags = lineFacts(t)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        max(when(col("c_mktsegment") === segment, 1).otherwise(0)).as("seg"),
        max(when(col("c_mktsegment") === segment &&
          col("l_quantity") >= minQty, 1).otherwise(0)).as("seg_hi"))
    val targetSuppliers = pairFlags.filter(col("seg_hi") === 1)
      .select("l_suppkey").distinct()
    val dtd = semi(pairFlags, targetSuppliers, Seq("l_suppkey"))
      .select("l_partkey").distinct()
    val dd = pairFlags.filter(col("seg") === 1).select("l_partkey").distinct()
    anti(dtd, dd, Seq("l_partkey"))
      .join(t.part.select(col("p_partkey").as("l_partkey"), col("p_name")),
        Seq("l_partkey"), "left")
      .select(col("l_partkey").as("p_partkey"), col("p_name"))
      .orderBy("p_partkey")
  }

  /** §3.2 x2 pipeline analogue (/root/reference/x2.2.py:238-247):
    *   CandidateDrugs = Drugs(OtherDiseases) − Drugs(MainDiseases)
    *   OtherDiseases  = Diseases(Targets(MainDiseases)) − MainDiseases
    * mapped as: main customers = `segment`; targets = their high-qty
    * parts; related customers = other-segment customers buying those
    * parts; candidate parts = related customers' parts minus the
    * segment's parts; phase-2 merge (J10) stamps per-candidate reach.
    */
  def relatedCandidates(spark: SparkSession, dir: String,
                        segment: String = "BUILDING",
                        minQty: Double = 45.0): DataFrame = {
    val t = Tables(spark, dir)
    // one aggregation of the fact join to (part, supplier, customer,
    // is_main) grain; every later set op runs on this identical
    // subtree so the physical plan reuses ONE exchange for the big
    // join instead of recomputing it per branch (see candidateParts)
    val grain = lineFacts(t)
      .groupBy(col("l_partkey"), col("l_suppkey"), col("o_custkey"),
        (col("c_mktsegment") === segment).as("is_main"))
      .agg(max(when(col("l_quantity") >= minQty, 1).otherwise(0)).as("any_hi"))
    val mainTargets = grain.filter(col("is_main") && col("any_hi") === 1)
      .select("l_partkey").distinct()
    val others = grain.filter(!col("is_main"))
    val relatedCustomers = semi(others, mainTargets, Seq("l_partkey"))
      .select("o_custkey").distinct()
    val relatedLines = semi(others, relatedCustomers, Seq("o_custkey"))
    val relatedParts = relatedLines.select("l_partkey").distinct()
    val mainParts = grain.filter(col("is_main")).select("l_partkey").distinct()
    val candidates = anti(relatedParts, mainParts, Seq("l_partkey"))
    semi(relatedLines, candidates, Seq("l_partkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(countDistinct(col("o_custkey")).as("n_related_customers"),
        countDistinct(col("l_suppkey")).as("n_suppliers"))
      .orderBy("p_partkey")
  }
}
