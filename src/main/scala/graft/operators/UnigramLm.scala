package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

import graft.functions.{TextFns, UnigramKernel, UnigramViterbi}

/** Unigram-LM subword tokenizer (the SentencePiece model family) —
  * the probabilistic counterpart of `BpeLearn`'s merge-based
  * tokenizer, completing the two tokenizer lineages a training-data
  * pipeline meets in practice:
  *
  *  - [[learnVocab]]: hard-EM (Viterbi-EM) vocabulary learning over
  *    the DISTINCT-WORD relation. Seed = the corpus's most frequent
  *    substrings (≤ `maxPieceLen` chars) plus every single character;
  *    each EM round Viterbi-segments every distinct word under the
  *    current piece costs (a codegen kernel expression — scan-stage,
  *    no UDF boxing), counts piece uses with ONE partial-aggregable
  *    keyed agg weighted by word frequency, re-estimates costs from
  *    the counts, and prunes to the vocab budget. Driver state is the
  *    vocab table itself — parameter-sized by construction, the same
  *    loop discipline as `BpeLearn.learnMerges` (state relation
  *    re-materialized per step, 1-deep lineage).
  *  - [[encodeWords]]: greedy longest-match inference (the WordPiece
  *    deployment algorithm) with the learned piece set — a pure
  *    in-task `aggregate` fold over each word, zero shuffle, exactly
  *    replayable as a recursive-CTE DP by any SQL engine (the q172
  *    oracle runs it in DuckDB).
  *
  * Costs are integer micro-nats, rounded ONCE at estimation time
  * (`round(-ln(count/total)·1e6)`), so the Viterbi DP is exact long
  * arithmetic — segmentations are bit-stable across engines, task
  * counts, and retries. Unknown single chars cost
  * [[UnkCostMicro]] (≫ any estimated piece cost), keeping every word
  * segmentable without letting UNK outbid a real piece.
  *
  * Scale shape (100 TB): the corpus parses to words once; everything
  * iterates on the distinct-word vocabulary relation (orders of
  * magnitude smaller — the same argument as BPE, SURVEY §2
  * extensions). Per round: one scan-stage segmentation pass + one
  * keyed agg; the collected piece-count relation is ≤ |vocab| +
  * |alphabet| rows — parameter-sized driver state, never corpus-
  * sized.
  */
object UnigramLm {

  /** Fixed unknown-single-char cost: 40 nats ≈ −ln(4e-18), far above
    * any cost a counted piece can receive, far below overflow.
    */
  val UnkCostMicro: Long = 40000000L

  private def costMicro(cnt: Long, total: Long): Long =
    math.round(-math.log(cnt.toDouble / total.toDouble) * 1e6)

  /** (w, n) distinct-word relation: one keyed count over the parse. */
  def distinctWords(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextFns.tokens(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** All substrings of `w` up to `maxLen` chars, with multiplicity. */
  private def substrings(w: Column, maxLen: Int): Column =
    flatten(transform(sequence(lit(0), length(w) - 1), i =>
      transform(sequence(lit(1), least(lit(maxLen), length(w) - i)), l =>
        w.substr(i + lit(1), l))))

  /** Learn a unigram-LM vocabulary; returns
    * (piece, cost_micro, n_uses) — `n_uses` the frequency-weighted
    * use count in the final EM round's Viterbi segmentation, the
    * vocab capped at `vocabSize` pieces plus every observed single
    * char. Also returns the per-round corpus Viterbi cost trace
    * (micro-nats; round 0 = under the seed costs) — hard-EM evidence
    * for the q171 invariant.
    */
  def learnVocabWithTrace(docs: DataFrame, text: Column, vocabSize: Int,
                          maxPieceLen: Int = 4, iters: Int = 3)
      : (DataFrame, Seq[Long]) = {
    require(vocabSize >= 1 && vocabSize <= 65536,
      s"vocabSize $vocabSize out of [1,65536] — the vocab is driver state")
    require(maxPieceLen >= 2 && maxPieceLen <= 16, s"maxPieceLen $maxPieceLen out of [2,16]")
    require(iters >= 1 && iters <= 16, s"iters $iters out of [1,16]")
    val spark = docs.sparkSession
    val words = distinctWords(docs, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    words.count()

    // ---- seed: frequent substrings + all single chars ----
    val subCounts = words
      .select(col("n"), explode(substrings(col("w"), maxPieceLen)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val singles = subCounts.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val topMulti = subCounts.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(math.max(0, 4 * vocabSize - singles.length))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    subCounts.unpersist(blocking = false)
    var counts: Seq[(String, Long)] = (singles ++ topMulti).toSeq
    var vocab: Map[String, Long] = estimate(counts)

    // ---- hard-EM rounds ----
    val trace = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastCounts = counts
    for (_ <- 1 to iters) {
      val segCounts = words
        .select(col("n"),
          explode(split(viterbiCol(col("w"), vocab, maxPieceLen), " ")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      // corpus cost under the vocab that PRODUCED this segmentation
      trace += segCounts.map { case (p, c) =>
        c * vocab.getOrElse(p, UnkCostMicro) }.sum
      lastCounts = prune(segCounts, vocabSize)
      vocab = estimate(lastCounts)
    }
    words.unpersist(blocking = false)

    import spark.implicits._
    val keep = lastCounts.toMap
    val df = keep.toSeq.map { case (p, c) => (p, vocab(p), c) }
      .toDF("piece", "cost_micro", "n_uses")
    (df, trace.toSeq)
  }

  def learnVocab(docs: DataFrame, text: Column, vocabSize: Int,
                 maxPieceLen: Int = 4, iters: Int = 3): DataFrame =
    learnVocabWithTrace(docs, text, vocabSize, maxPieceLen, iters)._1

  /** Keep every single-char piece + the top multi-char pieces by
    * (count desc, piece asc) within the vocab budget.
    */
  private def prune(counts: Seq[(String, Long)], vocabSize: Int): Seq[(String, Long)] = {
    val (singles, multi) = counts.partition(_._1.length == 1)
    val budget = math.max(0, vocabSize - singles.length)
    singles ++ multi.sortBy { case (p, c) => (-c, p) }.take(budget)
  }

  /** cost_micro per piece from counts (total = Σ kept counts). */
  private def estimate(counts: Seq[(String, Long)]): Map[String, Long] = {
    val total = counts.map(_._2).sum
    counts.map { case (p, c) => p -> costMicro(c, total) }.toMap
  }

  /** The Viterbi kernel as a scan-stage column (codegen expression;
    * the vocab map rides the plan as a reference object).
    */
  def viterbiCol(word: Column, vocab: Map[String, Long], maxLen: Int): Column = {
    val hm = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (k, v) => hm.put(k, java.lang.Long.valueOf(v)) }
    toCol(UnigramViterbi(toExpr(word), hm, maxLen, UnkCostMicro))
  }

  /** Greedy longest-match segmentation (WordPiece inference) of each
    * word in `words` ("w" column) against the piece SET: at every
    * position consume the longest vocab piece matching there, falling
    * back to the single character itself. One in-task `aggregate`
    * fold per word — the step relation never leaves the scan stage —
    * and exactly the DP a recursive-CTE SQL oracle replays.
    * Returns (w, toks) with `toks` the pieces space-joined.
    */
  def encodeWords(words: DataFrame, pieces: Seq[String], maxLen: Int): DataFrame = {
    require(pieces.nonEmpty, "empty piece set")
    require(pieces.forall(p => p.nonEmpty && !p.contains(" ")),
      "pieces must be non-empty and space-free")
    require(pieces.forall(_.length <= maxLen),
      s"piece longer than maxLen=$maxLen")
    val set = typedlit(pieces.map(_ -> 1).toMap)
    val w = col("w")
    val enc = aggregate(
      sequence(lit(1), length(w)),
      struct(lit(0).cast("int").as("pos"), lit("").as("toks")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val cand = coalesce(
          ((maxLen to 2 by -1).map { l =>
            val sub = w.substr(pos + lit(1), lit(l))
            when(length(sub) === l && element_at(set, sub).isNotNull, sub)
          }) :+ w.substr(pos + lit(1), lit(1)): _*)
        when(pos >= length(w), acc).otherwise(struct(
          (pos + length(cand)).cast("int").as("pos"),
          when(acc.getField("toks") === "", cand)
            .otherwise(concat(acc.getField("toks"), lit(" "), cand)).as("toks")))
      },
      acc => acc.getField("toks"))
    words.select(w, enc.as("toks"))
  }

  /** Sequential reference implementations (spec oracles). */
  private[graft] def learnVocabLocal(wordFreqs: Seq[(String, Long)], vocabSize: Int,
                                     maxPieceLen: Int = 4, iters: Int = 3)
      : (Seq[(String, Long, Long)], Seq[Long]) = {
    // seed
    val sub = scala.collection.mutable.Map.empty[String, Long]
    wordFreqs.foreach { case (w, n) =>
      for (i <- 0 until w.length; l <- 1 to math.min(maxPieceLen, w.length - i)) {
        val p = w.substring(i, i + l)
        sub(p) = sub.getOrElse(p, 0L) + n
      }
    }
    val (s1, m1) = sub.toSeq.partition(_._1.length == 1)
    val seed = s1 ++ m1.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, 4 * vocabSize - s1.length))
    var counts: Seq[(String, Long)] = seed
    var vocab = estimate(counts)
    val trace = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastCounts = counts
    for (_ <- 1 to iters) {
      val hm = new java.util.HashMap[String, java.lang.Long]
      vocab.foreach { case (k, v) => hm.put(k, java.lang.Long.valueOf(v)) }
      val segCounts = scala.collection.mutable.Map.empty[String, Long]
      wordFreqs.foreach { case (w, n) =>
        UnigramKernel.viterbi(w, hm, maxPieceLen, UnkCostMicro).split(" ")
          .foreach(p => segCounts(p) = segCounts.getOrElse(p, 0L) + n)
      }
      trace += segCounts.map { case (p, c) =>
        c * vocab.getOrElse(p, UnkCostMicro) }.sum
      lastCounts = prune(segCounts.toSeq, vocabSize)
      vocab = estimate(lastCounts)
    }
    (lastCounts.map { case (p, c) => (p, vocab(p), c) }, trace.toSeq)
  }

  private[graft] def encodeLocal(word: String, pieces: Set[String], maxLen: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      var l = math.min(maxLen, word.length - pos)
      while (l > 1 && !pieces.contains(word.substring(pos, pos + l))) l -= 1
      out += word.substring(pos, pos + l)
      pos += l
    }
    out.toSeq
  }
}
