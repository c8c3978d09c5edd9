package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface
  * (north star, repo:BASELINE.json). All column-in/column-out and
  * built on `org.apache.spark.sql.functions` higher-order functions,
  * so everything stays codegen'd — no Scala UDF in any hot path.
  */
object TextFns {

  /** Canonical text normalization used by fingerprinting/dedup:
    * lowercase, strip non-alphanumerics, collapse whitespace.
    */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Whitespace tokenization (documents.text is space-separated). */
  def tokens(c: Column): Column = split(c, " ")

  /** BPE-ish subword split: letters runs, digit runs, or single
    * non-alnum symbols — a deterministic stand-in for a real BPE
    * tokenizer's pre-tokenization regex.
    */
  def subwordTokens(c: Column): Column =
    regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Lexical diversity = |distinct tokens| / |tokens|. */
  def distinctTokenRatio(c: Column): Column = {
    val t = tokens(c)
    size(array_distinct(t)).cast("double") / size(t).cast("double")
  }

  /** Document fingerprint: md5 of the normalized text. Rolling-hash
    * flavored variants hang off the same normalization; md5 keeps the
    * DuckDB oracle expressible.
    */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** 64-bit content hash (xxhash64) of normalized text — cheaper than
    * md5 for exact-dedup keys at scale; not oracle-portable, used in
    * the internal dedup paths.
    */
  def fingerprint64(c: Column): Column = xxhash64(normText(c))

  /** Word n-gram shingles over a token array; empty array when the
    * document is shorter than n. Codegen'd via transform/sequence.
    */
  def wordShingles(tokenArr: Column, n: Int): Column = {
    require(n >= 1 && n <= 8, s"shingle size $n out of range")
    val sh = transform(
      sequence(lit(1), size(tokenArr) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(off => element_at(tokenArr, i + lit(off))): _*))
    when(size(tokenArr) >= n, sh).otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles straight off the normalized string in ONE
    * regex pass (overlapping matches via lookahead). Equivalent to
    * `wordShingles(tokens(normText(c)), n)` on single-space text but
    * far cheaper to codegen than the nested transform/element_at
    * tree — the hot-path form used by the dedup operators.
    */
  def wordShinglesFast(c: Column, n: Int): Column = {
    require(n >= 1 && n <= 8, s"shingle size $n out of range")
    val group = (1 to n).map(_ => "\\S+").mkString(" ")
    regexp_extract_all(normText(c), lit(s"(?=($group))\\S+ ?"), lit(1))
  }

  /** Sorted distinct 64-bit hashes of the normalized word n-gram
    * shingles, via the native one-pass kernel (TextExprs.scala) — the
    * dedup hot path. Same token boundaries as `tokens(normText(c))`;
    * values live in the hash domain, so use this where consumers only
    * need set identity/cardinality (jaccard, minhash), not the grams.
    */
  def shingleHashes(c: Column, n: Int): Column = toCol(ShingleHash64(toExpr(c), n))

  /** md5 hex of every k-word span, in position order — the span-dedup
    * kernel (see `WordSpanMd5` for the byte-range trick and the
    * HOF-equivalence contract).
    */
  def wordSpanMd5(c: Column, k: Int): Column = toCol(WordSpanMd5(toExpr(c), k))

  /** Quality-score facets (length / punctuation / stopword ratios) —
    * mirrors the usual pretraining-data heuristics. Returns a struct
    * so callers can select facets or the composite.
    */
  private val StopWords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "this", "that")

  def stopwordRatio(c: Column): Column = {
    val t = tokens(c)
    size(array_intersect(t, lit(StopWords.toArray))).cast("double") /
      greatest(size(t), lit(1)).cast("double")
  }

  def punctRatio(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[^a-zA-Z0-9\\s]", ""))).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  /** Composite quality heuristic in [0,1]: rewards mid-length docs,
    * lexical diversity, low punctuation noise.
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val divScore = distinctTokenRatio(c)
    val punctScore = lit(1.0) - least(punctRatio(c) * lit(4.0), lit(1.0))
    round((lenScore + divScore + punctScore) / lit(3.0), 4)
  }

  /** PII scrubbing for training corpora: emails, then phone-shaped
    * number groups, replaced with typed placeholder tokens. Pure
    * regexp_replace chain — codegen'd, linear, and expressible in the
    * DuckDB oracle. (A production scrubber adds locale-specific
    * patterns; the operator shape — ordered regex passes — is the
    * same.)
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]")

  def emailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailRe), lit(0)))

  /** Deterministic hash-based sampling: keep a row iff the first hex
    * digit of md5(key) falls in the accept set. Unlike rand()-based
    * sampling this is reproducible across engines, retries, and
    * partitionings — the property an auditable data pipeline needs —
    * and composes with stratification by grouping the survivors.
    * First-digit granularity is k/16; use more digits for finer
    * rates.
    */
  def hashSample(key: Column, acceptHexDigits: Seq[String]): Column =
    substring(md5(key.cast("string")), 1, 1).isin(acceptHexDigits: _*)

  /** Language-ID by stopword-hit scoring over per-language marker
    * lists (n-gram heuristic; deterministic argmax with fixed
    * language order for tie stability).
    */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "zh" -> Seq("的", "了", "是", "我", "不"))

  def langId(c: Column): Column = {
    val t = tokens(lower(c))
    // struct(score, negRank) argmax via greatest(): language order is
    // encoded as a rank so ties resolve to the earlier language.
    val scored = LangMarkers.zipWithIndex.map { case ((lang, markers), rank) =>
      struct(
        size(array_intersect(t, lit(markers.toArray))).as("score"),
        lit(-rank).as("neg_rank"),
        lit(lang).as("lang"))
    }
    greatest(scored: _*).getField("lang")
  }

  /** Jaro-Winkler similarity (native codegen kernel, StringExprs) —
    * DuckDB-parity semantics, see [[JaroWinklerKernel]].
    */
  def jaroWinkler(a: Column, b: Column): Column =
    toCol(JaroWinkler(toExpr(a), toExpr(b)))
}
