package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import graft.functions.{AcKernel, MultiPatternCounts, MultiPatternHits}

/** Dictionary tagging at corpus scale: match a pattern set (blocklist
  * phrases, topic keywords, contamination markers) against every
  * document in ONE pass per row via an Aho-Corasick automaton
  * ([[graft.functions.AcKernel]]) — the scan cost is O(corpus bytes +
  * matches) regardless of dictionary size, where the naive
  * N×contains() form re-reads every byte per pattern. The automaton
  * is driver-built model-sized state (it IS the dictionary) riding
  * the plan as a reference object, so tagging stays inside
  * whole-stage codegen in the scan stage — no UDF boxing, no
  * pattern-side join, no shuffle before the (already aggregated or
  * zero-filtered) hit rows.
  *
  * Match semantics: ALL occurrences, overlapping included — exactly
  * the positional-substring count an SQL oracle replays; see the
  * kernel scaladoc for why replace()-based counting is wrong.
  */
object Tagging {

  /** array<bigint> of per-pattern occurrence counts, positional (slot
    * i = patterns(i)). One automaton pass per row, codegen'd. Dense —
    * right when the consumer wants every slot (a feature vector); for
    * blocklist-scale dictionaries prefer [[patternHits]], whose
    * per-row output is hits-sized.
    */
  def patternCounts(text: Column, patterns: Seq[String]): Column =
    toCol(MultiPatternCounts(toExpr(text), AcKernel.build(patterns)))

  /** array<struct<p,n>> of the NONZERO per-pattern counts — the
    * blocklist-scale form: per-row output and garbage follow the
    * document's actual hits, never the dictionary width.
    */
  def patternHits(text: Column, patterns: Seq[String]): Column =
    toCol(MultiPatternHits(toExpr(text), AcKernel.build(patterns)))

  /** Decode the positional pattern slot to its text. Two regimes:
    * an inline array literal while the dictionary is small enough
    * that a literal is cheap, a broadcast lookup join at blocklist
    * scale — a 10⁵-element CreateArray would bloat the plan and the
    * generated code far beyond the automaton itself (which holds the
    * SAME content as compact trie arrays in ONE reference object),
    * while the name relation is dictionary-sized and broadcasts for
    * free. Measured on the 10⁵-triple dictionary in ProbeTagging.
    */
  private val MaxInlineDecode = 1024
  private def withPatternName(rel: DataFrame, idxCol: String,
                              patterns: Seq[String]): DataFrame =
    if (patterns.size <= MaxInlineDecode)
      rel.withColumn("pattern",
          element_at(array(patterns.map(lit): _*), col(idxCol) + 1))
        .drop(idxCol)
    else {
      val spark = rel.sparkSession
      import scala.jdk.CollectionConverters._
      val names = spark.createDataFrame(
        patterns.zipWithIndex.map { case (p, i) =>
          org.apache.spark.sql.Row(i, p) }.asJava,
        org.apache.spark.sql.types.StructType.fromDDL(
          s"$idxCol INT, pattern STRING"))
      rel.join(broadcast(names), idxCol).drop(idxCol)
    }

  /** Per-document hits: (id, pattern, n) with n > 0 only. The sparse
    * hit structs are exploded INSIDE the scan stage — nothing
    * pattern-shaped is produced, let alone shuffled, for the
    * (overwhelming at blocklist scale) documents that hit nothing.
    */
  def tagDocs(docs: DataFrame, idName: String, text: Column,
              patterns: Seq[String]): DataFrame =
    withPatternName(
      docs.select(col(idName), explode(patternHits(text, patterns)).as("__h"))
        .select(col(idName), col("__h.p").as("__p"), col("__h.n").as("n")),
      "__p", patterns)
      .select(col(idName), col("pattern"), col("n"))

  /** Leftmost-longest non-overlapping redaction of every dictionary
    * match — the PII/blocklist-scrub WRITE side of the tagging family
    * (detecting a blocklisted span is half the job; the pipeline then
    * ships the corpus with those spans replaced). One automaton pass
    * per row in the scan stage, O(bytes + matches); the selection
    * rule (leftmost start, longest match there, greedy cursor) is the
    * standard scrub semantics and fully deterministic, so the whole
    * operator carries a bit-exact SQL oracle (q209). Returns a
    * struct column (redacted, n_redactions).
    */
  def redact(text: Column, patterns: Seq[String],
             token: String = "[REDACTED]"): Column =
    toCol(graft.functions.MultiPatternRedact(toExpr(text),
      AcKernel.build(patterns),
      patterns.map(_.getBytes("UTF-8").length).toArray, token))

  /** Per-document redaction relation: (id, redacted, n_redactions). */
  def redactDocs(docs: DataFrame, idName: String, text: Column,
                 patterns: Seq[String],
                 token: String = "[REDACTED]"): DataFrame =
    docs.select(col(idName), redact(text, patterns, token).as("__r"))
      .select(col(idName), col("__r.redacted").as("redacted"),
        col("__r.n_redactions").as("n_redactions"))

  /** Corpus dictionary profile per (group, pattern): total occurrence
    * count and the number of documents with at least one hit. Groups
    * × patterns with zero hits are absent (the sparse kernel never
    * emits them — the oracle replays the same rule).
    */
  def patternStats(docs: DataFrame, groupName: String, text: Column,
                   patterns: Seq[String]): DataFrame =
    withPatternName(
      docs.select(col(groupName), explode(patternHits(text, patterns)).as("__h"))
        .select(col(groupName), col("__h.p").as("__p"), col("__h.n").as("n"))
        .groupBy(col(groupName), col("__p"))
        .agg(sum(col("n")).as("occurrences"),
          count(lit(1)).as("docs_with_hit")),
      "__p", patterns)
      .select(col(groupName), col("pattern"),
        col("occurrences"), col("docs_with_hit"))
}
