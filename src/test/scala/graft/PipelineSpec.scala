package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.pipelines.Repurpose

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("candidateParts respects the set-difference invariant (A−B)∩B=∅") {
    val t = Tables(spark, sfDir)
    val candidates = Repurpose.candidateParts(spark, sfDir)
    // parts the BUILDING segment already buys
    val dd = t.lineitem
      .join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .join(t.customer, col("c_custkey") === col("o_custkey"))
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("l_partkey").as("p_partkey")).distinct()
    assert(candidates.join(dd, Seq("p_partkey"), "left_semi").count() == 0)
  }

  test("relatedCandidates excludes all main-segment parts") {
    val t = Tables(spark, sfDir)
    val rel = Repurpose.relatedCandidates(spark, sfDir)
    val mainParts = t.lineitem
      .join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .join(t.customer, col("c_custkey") === col("o_custkey"))
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("l_partkey").as("p_partkey")).distinct()
    assert(rel.join(mainParts, Seq("p_partkey"), "left_semi").count() == 0)
  }

  test("every declared oracle has a matching query (driver contract)") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries run on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      withClue(name)(assert(n >= 0))
    }
  }

  test("multimodal resize and frame sampling keep the batch contract") {
    val media = Multimodal.mediaFromDocuments(
      spark.read.parquet(s"$sfDir/documents.parquet")).limit(50)
    val resized = Multimodal.resize(media, stride = 4)
    val cmp = media.select(col("media_id"), length(col("payload")).as("orig"))
      .join(resized.select(col("media_id"), length(col("payload")).as("small"),
        col("width")), "media_id")
    // payload shrinks (stride-4 keeps ~1/16 of image pixels, 1/4 of
    // audio samples; fixed headers survive) and stays a valid container
    assert(cmp.filter(col("small") >= col("orig")).count() == 0)
    assert(cmp.filter(col("width") < 0).count() == 0)
    val refeats = Multimodal.decodeFeatures(spark, resized)
    assert(refeats.filter(col("n_units") < 1).count() == 0)
    val frames = Multimodal.sampleFrames(media, everyN = 2)
    assert(frames.count() > 0)
    // every sampled frame is a self-contained 4x4 BMP, frame_no even
    assert(frames.filter(length(col("frame")) =!=
      graft.functions.MediaCodec.bmpSize(4, 4)).count() == 0)
    assert(frames.filter(col("frame_no") % 2 =!= 0).count() == 0)
  }

  test("two-level nested expand (J7: drug -> mechanisms -> targets)") {
    // mechanismsOfAction.rows[].targets[] shape from the reference
    // (/root/reference/opentargets_query_targets_for_drug.py:37-40):
    // double explode flattens both levels; counts must multiply out
    val df = spark.createDataFrame(Seq(
      ("CHEMBL690", Seq((("inhibitor"), Seq("T1", "T2")), (("agonist"), Seq("T3")))),
      ("CHEMBL25", Seq((("acetylator"), Seq("T4", "T5", "T6"))))
    )).toDF("drug_id", "mechanisms")
    val flat = df
      .select(col("drug_id"), explode(col("mechanisms")).as("m"))
      .select(col("drug_id"), col("m._1").as("mechanism"), explode(col("m._2")).as("target_id"))
    assert(flat.count() == 6)
    assert(flat.filter(col("drug_id") === "CHEMBL690").count() == 3)
    val cols = flat.columns.toSeq
    assert(cols == Seq("drug_id", "mechanism", "target_id"))
  }

  test("multimodal decode pipeline: schema, determinism, batch shape") {
    val media = Multimodal.mediaFromDocuments(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val feats = Multimodal.decodeFeatures(spark, media)
    val rows = feats.orderBy("media_id").limit(5).collect()
    assert(rows.forall(_.feature.length == Multimodal.FeatureDim))
    assert(rows.forall(r => r.frame_count >= 1 && r.n_bytes > 0))
    // deterministic across partitionings
    val a = feats.select("media_id", "n_bytes").orderBy("media_id").collect().toSeq
    val b = Multimodal.decodeFeatures(spark, media.repartition(7))
      .select("media_id", "n_bytes").orderBy("media_id").collect().toSeq
    assert(a == b)
  }
}
