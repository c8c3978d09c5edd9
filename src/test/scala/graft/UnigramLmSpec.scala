package graft

import org.apache.spark.sql.functions._

import graft.functions.UnigramKernel
import graft.operators.UnigramLm

/** Unigram-LM tokenizer: kernel DP hand-cases, codegen parity,
  * distributed-vs-sequential learning equality, hard-EM cost descent,
  * and greedy-encode equality with the sequential reference.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def hm(m: Map[String, Long]) = {
    val h = new java.util.HashMap[String, java.lang.Long]
    m.foreach { case (k, v) => h.put(k, java.lang.Long.valueOf(v)) }
    h
  }

  test("viterbi kernel: minimal-cost segmentation, exact long arithmetic") {
    val vocab = Map("ab" -> 10L, "abc" -> 25L, "c" -> 10L, "a" -> 12L, "b" -> 12L)
    // "abc": [abc]=25 vs [ab c]=20 vs [a b c]=34 → "ab c"
    assert(UnigramKernel.viterbi("abc", hm(vocab), 3, 40L) == "ab c")
    // unknown single char takes the unk cost and stays segmentable
    assert(UnigramKernel.viterbi("axb", hm(vocab), 3, 40L) == "a x b")
    // unknown MULTI-char substrings are never candidates
    assert(UnigramKernel.viterbi("zz", hm(Map("z" -> 5L)), 3, 40L) == "z z")
    assert(UnigramKernel.viterbi("", hm(vocab), 3, 40L) == "")
  }

  test("viterbi kernel: equal-cost tie prefers the longer last piece") {
    // [ab c] and [a bc] both cost 20 → last piece longer = "bc" wins
    val vocab = Map("ab" -> 10L, "bc" -> 10L, "a" -> 10L, "c" -> 10L)
    assert(UnigramKernel.viterbi("abc", hm(vocab), 2, 40L) == "a bc")
  }

  test("viterbiCol (codegen) equals the kernel on fixture words") {
    val vocab = Map("th" -> 8L, "the" -> 9L, "a" -> 11L, "t" -> 12L, "h" -> 13L,
      "e" -> 10L, "in" -> 7L, "ing" -> 12L)
    val words = UnigramLm.distinctWords(
      spark.read.parquet(s"$sfDir/documents.parquet"), col("text"))
    val got = words.select(col("w"),
        UnigramLm.viterbiCol(col("w"), vocab, 3).as("seg"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(got.nonEmpty)
    got.foreach { case (w, seg) =>
      assert(seg == UnigramKernel.viterbi(w, hm(vocab), 3, UnigramLm.UnkCostMicro),
        s"codegen/kernel divergence on '$w'")
      assert(seg.replace(" ", "") == w, s"segmentation must respell '$w'")
    }
  }

  test("learnVocab equals the sequential reference, trace included") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (df, trace) = UnigramLm.learnVocabWithTrace(docs, col("text"),
      vocabSize = 60, maxPieceLen = 4, iters = 3)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val wordFreqs = UnigramLm.distinctWords(docs, col("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val (want, wantTrace) = UnigramLm.learnVocabLocal(wordFreqs,
      vocabSize = 60, maxPieceLen = 4, iters = 3)
    assert(got.toSeq == want.sortBy(_._1))
    assert(trace == wantTrace)
    // hard-EM: corpus Viterbi cost never increases round over round
    assert(trace.zip(trace.drop(1)).forall { case (a, b) => b <= a },
      s"EM cost increased: $trace")
  }

  test("encodeWords equals the sequential greedy reference") {
    val pieces = Seq("th", "the", "ing", "at", "ion", "er", "st")
    val words = UnigramLm.distinctWords(
      spark.read.parquet(s"$sfDir/documents.parquet"), col("text"))
    val rows = UnigramLm.encodeWords(words, pieces, maxLen = 3)
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(rows.nonEmpty)
    rows.foreach { case (w, toks) =>
      val want = UnigramLm.encodeLocal(w, pieces.toSet, 3).mkString(" ")
      assert(toks == want, s"greedy divergence on '$w': $toks vs $want")
      assert(toks.replace(" ", "") == w)
    }
  }

  test("encodeWords hand-cases: longest match wins, unknown chars fall back") {
    val words = Seq("thering", "xqz", "a").toDF("w")
    val out = UnigramLm.encodeWords(words, Seq("th", "the", "er", "ing"), 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // greedy takes "the" (longest at 0), then "r i n g"? no: "ring"
    // has no piece at r; r, then "ing"
    assert(out("thering") == "the r ing")
    assert(out("xqz") == "x q z")
    assert(out("a") == "a")
  }
}
