package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index construction and index-backed boolean search —
  * the batch-built search index behind an entity-search endpoint
  * (the scale path for `RelOps.search`'s LIKE scan: the reference's
  * search API (/root/reference/opentargets_client_api.py:117-156)
  * scans server-side per request; a corpus engine builds the index
  * once and serves term lookups from it).
  *
  * Postings are (term, doc, positions) rows — the flat relational
  * encoding that shards by term, supports per-term skew handling,
  * and feeds both boolean retrieval and phrase/proximity scoring.
  * Construction is one explode + one keyed agg (positions sorted
  * within (term, doc) — deterministic); at 100 TB the postings
  * relation is bucketed by term (`sources.Bucketing`) so query-time
  * term lookups are pruned scans, the same layout trick as the IVF
  * index.
  */
object InvertedIndex {

  /** Postings relation: one row per (term, doc) with `df` omitted —
    * `positions` is the comma-joined 0-based token offsets (sorted),
    * `tf` the term frequency.
    */
  def build(docs: DataFrame, idName: String, text: Column): DataFrame =
    docs.select(col(idName), posexplode(split(text, " ")).as(Seq("pos", "term")))
      .groupBy(col("term"), col(idName))
      .agg(count(lit(1)).as("tf"),
        concat_ws(",", sort_array(collect_list(col("pos")))).as("positions"))

  /** Document frequency per term — the index's dictionary. */
  def dictionary(postings: DataFrame, idName: String): DataFrame =
    postings.groupBy(col("term"))
      .agg(countDistinct(col(idName)).as("df"),
        sum(col("tf")).as("cf"))

  /** Boolean AND retrieval over the index: documents containing ALL
    * `terms`. One semi-filtered scan of the postings + a count
    * aggregate — never touches raw text.
    */
  def searchAll(postings: DataFrame, idName: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty)
    postings.filter(col("term").isin(terms: _*))
      .groupBy(col(idName))
      .agg(countDistinct(col("term")).as("__nt"))
      .filter(col("__nt") === terms.distinct.size)
      .select(col(idName))
  }

  /** Boolean OR retrieval: documents containing ANY of `terms`. */
  def searchAny(postings: DataFrame, idName: String, terms: Seq[String]): DataFrame =
    postings.filter(col("term").isin(terms: _*))
      .select(col(idName)).distinct()
}
