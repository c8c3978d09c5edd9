package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeLearn

class BpeLearnSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: hand-computed merge sequence") {
    // "aaab"×3 + "ab"×2 → (a,a) 6 beats (a,b) 5; after the merge
    // (a,b) 5 beats (aa,a) 3; then (aa,ab) 3; then nothing ≥ 2
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val got = BpeLearn.learnMerges(docs, col("text"), numMerges = 8)
      .orderBy("step")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (0, "a", "a", "aa", 6L),
      (1, "a", "b", "ab", 5L),
      (2, "aa", "ab", "aaab", 3L)))
  }

  test("greedy apply: 'aaa' under (a,a) merges left-to-right to [aa, a]") {
    // if the fold re-merged the fresh token, step 1 would see (aa,a)
    // count 0 instead of 2 — the merge table exposes the apply order
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val got = BpeLearn.learnMerges(docs, col("text"), numMerges = 2)
      .orderBy("step")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (0, "a", "a", "aa", 4L),  // two (a,a) pairs per word
      (1, "aa", "a", "aaa", 2L)))
  }

  test("distributed merges equal the sequential reference (fixture corpus)") {
    val fx = Tables(spark, sfDir).documents
    val got = BpeLearn.learnMerges(fx, col("text"), numMerges = 6)
      .select("step", "left", "right", "pair_count")
      .as[(Int, String, String, Long)].collect().toSeq
    val words = fx.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .as[(String, Long)].collect().toSeq
    assert(got == BpeLearn.learnMergesLocal(words, numMerges = 6) && got.size == 6)
  }

  test("argmax pair count never increases step-over-step") {
    val fx = Tables(spark, sfDir).documents
    val counts = BpeLearn.learnMerges(fx, col("text"), numMerges = 6)
      .orderBy("step").select("pair_count").as[Long].collect().toSeq
    assert(counts.zip(counts.drop(1)).forall { case (a, b) => b <= a })
  }

  test("encode: chained matches merge fully in the lookahead pass") {
    // " a b a b a b " — a space-consuming replace would take matches
    // 1 and 3 only (2 shares a boundary space with 1); the lookahead
    // kernel must merge every (a,b) adjacency in one greedy pass
    val docs = Seq((1L, "ababab xab abx")).toDF("doc_id", "text")
    val got = BpeLearn.encode(docs, "doc_id", col("text"),
        Seq("a" -> "b"))
      .select(col("tokens")).as[Seq[String]].collect().toSet
    assert(got == Set(Seq("ab", "ab", "ab"), Seq("x", "ab"), Seq("ab", "x")))
  }

  test("encode: SELF-merges pair runs greedily, odd symbol at the end") {
    // the learnMerges fold gives "lllll" under (l,l) → [ll, ll, l];
    // the encode kernel must align identically or later
    // order-sensitive merges diverge — the realignment trap the old
    // space-consuming kernel had ([ll, l, ll])
    val docs = Seq((1L, "lllll llll lll ll l")).toDF("doc_id", "text")
    val merges = Seq("l" -> "l", "ll" -> "l")
    val got = BpeLearn.encode(docs, "doc_id", col("text"), merges)
      .select(col("tokens")).as[Seq[String]].collect().toSeq
    val words = Seq("lllll", "llll", "lll", "ll", "l")
    words.foreach { w =>
      val want = BpeLearn.encodeLocal(w, merges)
      assert(got.contains(want), s"word '$w': expected $want in $got")
    }
    // and the exact greedy shape, spelled out: (l,l) pairs "lllll"
    // into [ll, ll, l] (odd at the END), then (ll,l) takes the
    // SECOND ll with the trailing l → [ll, lll]. The old kernel's
    // realignment [ll, l, ll] would instead give [ll, ll, l] wrongly
    // merged as [lll, ll] — order-sensitive divergence made visible.
    assert(BpeLearn.encodeLocal("lllll", merges) == Seq("ll", "lll"))
    assert(got.toSet == words.map(BpeLearn.encodeLocal(_, merges)).toSet)
  }

  test("encode: regex metacharacters in symbols are literal") {
    // corpus symbols are arbitrary characters — a '.' or '(' in a
    // merge pair must match itself, not regex syntax
    val docs = Seq((1L, "a.b (c x)")).toDF("doc_id", "text")
    val got = BpeLearn.encode(docs, "doc_id", col("text"),
        Seq("a" -> ".", "(" -> "c"))
      .select(col("tokens")).as[Seq[String]].collect().toSet
    assert(got == Set(Seq("a.", "b"), Seq("(c"), Seq("x", ")")))
  }

  test("encode equals the sequential greedy reference on adversarial words") {
    val merges = Seq("a" -> "b", "ab" -> "c", "b" -> "a", "c" -> "d")
    val words = Seq("ababab", "abcabc", "aababcc", "babab", "abcd",
      "cdcd", "aaabbb", "xyz", "a", "abababababab")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = BpeLearn.encode(docs, "doc_id", col("text"), merges)
      .select(col("doc_id"), col("tokens"))
      .as[(Long, Seq[String])].collect().toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) == BpeLearn.encodeLocal(w, merges),
        s"word '$w'")
    }
  }

  test("encode applies the corpus's own LEARNED merge table exactly (kernel vs sequential)") {
    // the q151 consumer shape: learn on the corpus, encode the
    // vocabulary with the learned table — the distributed replace
    // kernel must agree with the sequential greedy fold word by word
    // (this exercises real learned merges, including any produced by
    // doubled letters like 'agg')
    val fx = Tables(spark, sfDir).documents
    val merges = BpeLearn.learnMerges(fx, col("text"), numMerges = 6)
      .orderBy("step").select("left", "right")
      .as[(String, String)].collect().toSeq
    val words = fx.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String].collect().toSeq
    val got = BpeLearn.encode(
        words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
          .toDF("doc_id", "text"),
        "doc_id", col("text"), merges)
      .select(col("doc_id"), col("tokens"))
      .as[(Long, Seq[String])].collect().toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) == BpeLearn.encodeLocal(w, merges), s"word '$w'")
    }
  }
}
