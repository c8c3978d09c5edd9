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

  /** Append a new batch's postings to a persisted index without
    * touching the existing files: posting rows are PER-DOCUMENT
    * (term, id, tf, positions) — a new document's rows are disjoint
    * from every archived document's — and every retrieval statistic
    * (df, dl, avgdl, N) derives from the postings relation at query
    * time, so an appended index answers BIT-IDENTICALLY to one
    * rebuilt from the union corpus (spec-pinned). This is the
    * exact-append the IVF index (centroid drift) and the minhash
    * archive (fixed hash parameters) only approximate: per-document
    * index state has no globally-trained component at all. Batch and
    * archive id spaces must be disjoint (a re-ingested id would
    * double-count its term frequencies) — ENFORCED with a loud
    * rejection before any file is written, the requireShingleN /
    * requireBandParams discipline: one semi-join against the archived
    * ids, `take(1)` so the driver stops pulling partitions at the
    * first surfaced overlap (the scan side of the semi-join still
    * reads the archived index — O(archive) per append, a build-time
    * step off every query path). Not crash-atomic — run
    * inside the caller's publish step (an [[Artifact.ensure]] build),
    * like every other append here. Each append lands one file set —
    * fold the postings with [[graft.sources.Compaction
    * .compactAppends]] between appends at high cadence.
    */
  def appendPostings(indexPath: String, newDocs: DataFrame,
                     idName: String, text: Column): Unit = {
    // bootstrap: appending to a not-yet-existing index creates
    // generation 0 (the pre-guard behavior — nothing to clash with).
    // Hadoop-FS check: the read/write below accept remote indexPaths,
    // and a java.io.File check would silently skip the guard there
    if (Artifact.hadoopDirExists(newDocs.sparkSession, indexPath)) {
      val archivedIds = newDocs.sparkSession.read.parquet(indexPath)
        .select(col(idName))
      val clash = newDocs.select(col(idName))
        .join(archivedIds, Seq(idName), "left_semi").take(1)
      require(clash.isEmpty,
        s"appendPostings: batch re-ingests archived $idName " +
          s"${clash.head.get(0)} — id spaces must be disjoint")
    }
    build(newDocs, idName, text)
      .write.mode("append").parquet(indexPath)
  }

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

  /** BM25-ranked retrieval over the index: top-`k` documents for a
    * bag of query `terms`, scored with Okapi BM25 (Lucene's
    * always-positive idf form, ln((N-df+0.5)/(df+0.5)+1)).
    *
    * Plan shape (the 100 TB contract): the postings scan is filtered
    * to the query terms FIRST (pruned term-bucket scan once the
    * relation is bucketed by term), the per-doc length relation is an
    * aggregate of the same postings, corpus stats (N, avgdl) are a
    * 1-row broadcast, and the per-term df/idf table is
    * query-parameter-sized and broadcast. The only full-width shuffle
    * keys on the doc id; the top-k is a TakeOrderedAndProject.
    *
    * Fixed-point discipline (cross-engine hash parity): `ln` is the
    * one libm-dependent term, so idf is rounded to 1e-4 immediately;
    * the tf normalization — pure IEEE arithmetic — is rounded to
    * 1e-6; the per-(doc,term) contribution is the integer product of
    * the two, so the per-doc sum is exact integer math, identical
    * under any aggregation order. The emitted `bm25` double is that
    * integer scaled by 1e-10.
    */
  def bm25TopK(docs: DataFrame, idName: String, text: Column,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKIndexed(build(docs, idName, text), idName, terms, k, k1, b)

  /** [[bm25TopK]] over a PREBUILT postings relation — the "index
    * once, query many" form matching [[searchAll]]/[[searchAny]]: the
    * corpus explode+agg runs (or is read back from its bucketed
    * layout) once, not once per plan branch per query. The per-doc
    * length and corpus stats derive from the postings alone
    * (dl = Σ tf), so no raw-text scan appears anywhere in the plan.
    */
  def bm25TopKIndexed(postings: DataFrame, idName: String,
                      terms: Seq[String], k: Int,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && k >= 1)
    val qTerms = terms.distinct
    val dl = postings.groupBy(col(idName)).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("nd"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val idf = postings.filter(col("term").isin(qTerms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"), col("avgdl"),
        floor(log((col("nd") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)) * lit(1e4) + lit(0.5)).cast("long").as("idf4"))
    postings.filter(col("term").isin(qTerms: _*))
      .join(dl, Seq(idName))
      .join(broadcast(idf), Seq("term"))
      .withColumn("tfn6",
        floor(col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
          * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy(col(idName))
      .agg(sum(col("idf4") * col("tfn6")).as("fp"),
        count(lit(1)).as("n_terms"))
      .select(col(idName), col("n_terms"),
        (col("fp").cast("double") / lit(1e10)).as("bm25"))
      .orderBy(col("bm25").desc, col(idName).asc)
      .limit(k)
  }
}
