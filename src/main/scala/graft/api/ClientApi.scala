package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.RelOps._

/** The reference's operator toolbox — the eight functions of
  * /root/reference/opentargets_client_api.py (:106-292) — with the
  * same names and semantics, as one-DAG DataFrame transforms over a
  * KnowledgeGraph. A user of the reference maps each call 1:1:
  * where the Python issues one HTTP request per driving row and
  * dedups with insertion-ordered sets, these return a distributed
  * plan whose keep-first winners are deterministic (score desc, id
  * asc — SURVEY.md §4.2's ordering trap).
  */
object ClientApi {

  /** get_disease_ids(name) — search, all hits, deduped keep-first
    * (opentargets_client_api.py:106-118).
    */
  def getDiseaseIds(kg: KnowledgeGraph, queryString: String): DataFrame =
    dedupKeepFirst(
      search(kg.diseases, col("name"), queryString),
      Seq(col("id")), Seq(col("id").asc))

  /** get_disease_targets(diseaseIds, minScore) — J1 fan-out + P3
    * threshold + SO5 dedup (opentargets_client_api.py:133-156).
    * Keeps provenance (disease_id) of the winning edge.
    */
  def getDiseaseTargets(kg: KnowledgeGraph, diseaseIds: DataFrame,
                        minScore: Double): DataFrame = {
    val expanded = fanout(diseaseIds.select(col("id").as("disease_id")),
      kg.associatedTargets, Seq("disease_id"))
    dedupKeepFirst(
      thresholdFilter(expanded, col("score"), minScore),
      Seq(col("target_id")), Seq(col("score").desc, col("disease_id").asc))
      .select(col("target_id").as("id"), col("score"), col("disease_id"))
  }

  /** get_target_diseases(targetIds, minScore, excludeDiseaseIds) — J2
    * fan-out + threshold + exclusion of the main diseases + dedup
    * (opentargets_client_api.py:158-186).
    */
  def getTargetDiseases(kg: KnowledgeGraph, targetIds: DataFrame,
                        minScore: Double, excludeDiseaseIds: DataFrame): DataFrame = {
    val expanded = fanout(targetIds.select(col("id").as("target_id")),
      kg.associatedDiseases, Seq("target_id"))
    val kept = anti(
      thresholdFilter(expanded, col("score"), minScore),
      excludeDiseaseIds.select(col("id").as("disease_id")), Seq("disease_id"))
    dedupKeepFirst(kept, Seq(col("disease_id")),
      Seq(col("score").desc, col("target_id").asc))
      .select(col("disease_id").as("id"), col("score"), col("target_id"))
  }

  /** get_disease_drugs(diseaseIds) — J3 fan-out through knownDrugs
    * rows, deduped (opentargets_client_api.py:188-205).
    */
  def getDiseaseDrugs(kg: KnowledgeGraph, diseaseIds: DataFrame): DataFrame = {
    val expanded = fanout(diseaseIds.select(col("id").as("disease_id")),
      kg.knownDrugs, Seq("disease_id"))
    dedupKeepFirst(expanded, Seq(col("drug_id")),
      Seq(col("phase").desc, col("disease_id").asc, col("target_id").asc))
      .select(col("drug_id").as("id"), col("phase"), col("disease_id"))
  }

  /** get_drug_info(drugIds) — per-drug facets + linked target ids as
    * a list column (opentargets_client_api.py:207-249): join +
    * sorted collect per group.
    */
  def getDrugInfo(kg: KnowledgeGraph, drugIds: DataFrame): DataFrame = {
    val joined = fanout(drugIds.select(col("id").as("drug_id")),
      kg.linkedTargets, Seq("drug_id"))
    collectPerGroup(joined, Seq(col("drug_id")), col("target_id"), "linked_targets")
      .join(kg.drugs.withColumnRenamed("id", "drug_id"), Seq("drug_id"), "left")
      .select(col("drug_id").as("id"), col("name"), col("linked_targets"))
  }

  /** get_drug_first_target(drugIds) — the `rows[0]` pick, made
    * deterministic via the edge rank (x2.py:211-218).
    */
  def getDrugFirstTarget(kg: KnowledgeGraph, drugIds: DataFrame): DataFrame =
    firstPerGroup(
      fanout(drugIds.select(col("id").as("drug_id")), kg.linkedTargets, Seq("drug_id")),
      Seq(col("drug_id")), Seq(col("rank").asc))
      .select(col("drug_id").as("id"), col("target_id"))

  /** get_drug_targets(drugIds) — flat all-targets variant
    * (opentargets_client_api.py:254-268).
    */
  def getDrugTargets(kg: KnowledgeGraph, drugIds: DataFrame): DataFrame =
    dedupKeepFirst(
      fanout(drugIds.select(col("id").as("drug_id")), kg.linkedTargets, Seq("drug_id")),
      Seq(col("target_id")), Seq(col("rank").asc, col("drug_id").asc))
      .select(col("target_id").as("id"), col("drug_id"))

  /** get_target_pathways(targetIds) — J6 fan-out, global dedup by
    * pathwayId (opentargets_client_api.py:270-292;
    * pathways_query.py:29-37).
    */
  def getTargetPathways(kg: KnowledgeGraph, targetIds: DataFrame): DataFrame =
    dedupKeepFirst(
      fanout(targetIds.select(col("id").as("target_id")), kg.pathways, Seq("target_id")),
      Seq(col("pathwayId")), Seq(col("target_id").asc))
      .select(col("pathwayId"), col("pathway"), col("topLevelTerm"), col("target_id"))
}
