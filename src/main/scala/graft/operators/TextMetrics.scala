package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Intra-document repetition metrics — the Gopher-style quality
  * signals that catch boilerplate and degenerate (looping) text,
  * complementing the cross-document dedup family: a page that is 40%
  * one repeated n-gram is low-quality even if globally unique.
  *
  * Shape: explode n-grams (NOT distinct — multiplicity is the
  * signal), one keyed count per (doc, gram), one keyed rollup per
  * doc. Both aggregations partial-aggregate map-side; nothing is
  * quadratic and no per-doc data structure leaves the executors, so
  * the operator is a straight two-shuffle pipeline at any corpus
  * size.
  */
object TextMetrics {

  /** Per-document n-gram repetition profile:
    *  - `top{n}_frac`: occurrences of the single most frequent n-gram
    *    over all n-gram occurrences (Gopher's "top n-gram coverage");
    *  - `dup{n}_frac`: fraction of n-gram occurrences whose gram
    *    appears more than once ("duplicate n-gram coverage");
    *  - `n_grams`: total n-gram occurrences.
    * Documents shorter than `n` tokens produce no grams and drop out.
    */
  def ngramRepetition(docs: DataFrame, idName: String, text: Column,
                      n: Int = 2): DataFrame = {
    val grams = docs.select(col(idName).as("id"),
        explode(TextFns.wordShinglesFast(text, n)).as("g"))
    val counts = grams.groupBy(col("id"), col("g"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("id"))
      .agg(max(col("c")).as("mx"),
        sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))).as("dup"),
        sum(col("c")).as("tot"))
      .select(col("id").as(idName),
        round(col("mx").cast("double") / col("tot").cast("double"), 6)
          .as(s"top${n}_frac"),
        round(col("dup").cast("double") / col("tot").cast("double"), 6)
          .as(s"dup${n}_frac"),
        col("tot").as("n_grams"))
  }

  /** The single highest-TF-IDF term of every document — the classic
    * "what is this page about" keyword extraction, and the corpus-vs-
    * document statistic join a training pipeline uses for topic
    * balancing.
    *
    * Shape: one (doc, token) count [tf], one token rollup over THAT
    * relation [document frequency — tf is already distinct per (doc,
    * token), so `count(*)` is exactly df, no second pass over raw
    * tokens], the corpus size as a 1-row broadcast cross join, then a
    * per-doc top-1 window. Scores are rounded to 1e-6 BEFORE ranking
    * so winner selection cannot flip on sub-ulp engine differences;
    * ties break on the token itself. All shuffles are keyed (token /
    * doc id) — nothing global, nothing quadratic.
    */
  def tfidfTop1(docs: DataFrame, idName: String, text: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col(idName).as("id"),
        explode(TextFns.tokens(text)).as("token"))
      .groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("dfreq"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("token")).crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log((col("n_docs").cast("double") + 1.0) /
          (col("dfreq").cast("double") + 1.0)), 6))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("token").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("id").as(idName), col("token"), col("score"))
  }

  /** Vocabulary coverage: build the top-`vocabSize` corpus vocabulary
    * (by token count, ties on the token itself so the cut is
    * deterministic on every engine) and score each document's
    * out-of-vocabulary token fraction — the "will my tokenizer
    * fragment this text" signal used to gate corpora before training.
    *
    * The vocabulary top-V is an `orderBy(...).limit(V)` — planned as
    * TakeOrderedAndProject (per-partition top-V, no global sort, no
    * single-partition window) — and is parameter-sized, so it
    * broadcast-joins back against the token relation. One keyed count
    * shuffle + one keyed per-doc rollup; linear at any corpus size.
    */
  def oovRate(docs: DataFrame, idName: String, text: Column,
              vocabSize: Int): DataFrame = {
    val tok = docs.select(col(idName).as("id"),
      explode(TextFns.tokens(text)).as("token"))
    val vocab = tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token").asc).limit(vocabSize)
      .select(col("token"), lit(1).as("__in"))
    tok.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("id").as(idName), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_frac"))
  }

  /** Per-document mean unigram surprisal −E[ln p(token)] under the
    * corpus's own unigram model — the cheap "perplexity-ish" quality
    * signal (gibberish and boilerplate score far from the corpus
    * mean; a real LM scorer slots into the same join shape).
    *
    * Token log-probs are quantized to 1e-4 fixed point BEFORE the
    * per-doc sum, so the aggregation is exact integer math — the
    * cross-engine result cannot drift with float summation order, and
    * sub-ulp `ln` differences between engines sit ~12 orders of
    * magnitude below the quantum. Shapes: one keyed token count
    * (vocabulary-sized, shuffled equi-join — no broadcast assumption
    * on the vocabulary), a 1-row corpus-total broadcast, one keyed
    * per-doc rollup. Linear at any corpus size.
    */
  /** Mean bigram surprisal per document: −ln p(w₂|w₁) under the
    * corpus's own bigram model, p(w₂|w₁) = c(w₁w₂)/c(w₁·) with c(w₁·)
    * the bigram-head count — the conditional complement of
    * [[unigramSurprisal]], and the stronger fluency signal (a doc of
    * common words in an uncommon ORDER scores high here but low
    * there). No smoothing is needed: every scored bigram was observed.
    *
    * Same exactness discipline as unigramSurprisal: log-probs go to
    * 1e-4 fixed point before the per-doc aggregation, so the sums are
    * exact integer math on every engine. Bigrams are built IN-TASK
    * (zip_with over two slices of the token array — no positional
    * self-join); the model tables are two keyed aggs of the exploded
    * bigram relation. Docs with < 2 tokens have no bigrams and drop
    * out, mirroring ngramRepetition's short-doc contract.
    */
  def bigramSurprisal(docs: DataFrame, idName: String, text: Column): DataFrame = {
    val toks = TextFns.tokens(text)
    val bg = docs.select(col(idName).as("id"),
      explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val pair = bg.groupBy(col("w1"), col("bg")).agg(count(lit(1)).as("c"))
    val head = pair.groupBy(col("w1")).agg(sum(col("c")).as("h"))
    val lp = pair.join(head, Seq("w1"))
      .select(col("bg"),
        floor(-log(col("c").cast("double") / col("h")) * lit(1e4) + lit(0.5))
          .cast("long").as("lp4"))
    bg.join(lp, Seq("bg"))
      .groupBy(col("id"))
      .agg(sum(col("lp4")).as("slp"), count(lit(1)).as("nb"))
      .select(col("id").as(idName), col("nb").as("n_bigrams"),
        (floor(col("slp").cast("double") / (lit(1e4) * col("nb")) * lit(1e6)
          + lit(0.5)) / lit(1e6)).as("avg_surprisal"))
  }

  /** Domain drift: per-group KL divergence of the group's unigram
    * distribution from the whole-corpus distribution, KL(P_g ‖ P) =
    * Σ_t p_g(t)·ln(p_g(t)/p(t)) — the scalar a mixture designer
    * watches to see which domain is drifting from the blend (and the
    * quantity temperature mixing implicitly flattens). Every group
    * token exists in the corpus, so no smoothing is needed and KL is
    * finite by construction.
    *
    * Exactness: the per-token log-ratio goes to 1e-4 fixed point and
    * is weighted by the INTEGER token count, so the per-group sum is
    * exact integer math; the single final division is per-group.
    * Two keyed aggs + a groups×vocab-sized join — scan shapes only.
    */
  def domainKl(docs: DataFrame, groupName: String, text: Column): DataFrame = {
    val tok = docs.select(col(groupName).as("g"),
      explode(TextFns.tokens(text)).as("token"))
    val gl = tok.groupBy(col("g"), col("token")).agg(count(lit(1)).as("nl"))
    val gn = gl.groupBy(col("g")).agg(sum(col("nl")).as("ntot"))
    val cv = gl.groupBy(col("token")).agg(sum(col("nl")).as("c"))
    val n = cv.agg(sum(col("c")).as("n"))
    gl.join(gn, Seq("g")).join(cv, Seq("token")).crossJoin(broadcast(n))
      .select(col("g"), col("nl"), col("ntot"),
        floor(log(col("nl").cast("double") * col("n")
          / (col("ntot").cast("double") * col("c"))) * lit(1e4) + lit(0.5))
          .cast("long").as("lr4"))
      .groupBy(col("g"))
      .agg(sum(col("nl") * col("lr4")).as("fp"), max(col("ntot")).as("ntot"))
      .select(col("g").as(groupName), col("ntot").as("n_tokens"),
        (floor(col("fp").cast("double") / (lit(1e4) * col("ntot")) * lit(1e6)
          + lit(0.5)) / lit(1e6)).as("kl"))
  }

  /** Per-group approximate band edges over a score column: the
    * (lo, hi) quantile values from ONE un-sorted, partial-aggregable
    * pass (`percentile_approx` — the GK sketch, the q83/q179 device),
    * as a #groups-sized relation (group, edge_lo, edge_hi). This is
    * the data-scale half of perplexity-band pruning: q203's exact
    * per-language rank window sorts each language's whole partition
    * on one reducer — a Zipf-skewed corpus (one language can be more
    * than half of 100 TB) makes that a scale-killer, exactly the
    * q170→q179 exact-vs-approx split. The sketch guarantee (edge rank
    * within n/accuracy of the target rank) is what the q204 envelope
    * pins as verdict booleans.
    */
  def approxBandEdges(scored: DataFrame, groupName: String,
                      valueName: String, lo: Double, hi: Double,
                      accuracy: Int): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad band [$lo, $hi]")
    require(accuracy >= 100, s"accuracy $accuracy too loose to pin")
    scored.groupBy(col(groupName))
      .agg(percentile_approx(col(valueName), array(lit(lo), lit(hi)),
        lit(accuracy)).as("__e"))
      .select(col(groupName), col("__e").getItem(0).as("edge_lo"),
        col("__e").getItem(1).as("edge_hi"))
  }

  /** Keep rows strictly above the lo edge and at-or-below the hi edge
    * — the approx twin of the exact (lo·n, hi·n] rank band. The edges
    * relation is parameter-sized, so the join broadcasts and the
    * corpus side never shuffles: two linear scans total (edge sketch
    * + filter), no sort, no window.
    */
  def pruneToBand(scored: DataFrame, edges: DataFrame, groupName: String,
                  valueName: String): DataFrame =
    scored.join(broadcast(edges), groupName)
      .filter(col(valueName) > col("edge_lo") &&
        col(valueName) <= col("edge_hi"))
      .drop("edge_lo", "edge_hi")

  def unigramSurprisal(docs: DataFrame, idName: String, text: Column): DataFrame = {
    val tok = docs.select(col(idName).as("id"),
      explode(TextFns.tokens(text)).as("token"))
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val tot = tok.select(count(lit(1)).as("n"))
    val lp = freq.crossJoin(broadcast(tot))
      .select(col("token"),
        floor(-log(col("c").cast("double") / col("n")) * lit(1e4) + lit(0.5))
          .cast("long").as("lp4"))
    tok.join(lp, Seq("token"))
      .groupBy(col("id"))
      .agg(sum(col("lp4")).as("slp"), count(lit(1)).as("nt"))
      .select(col("id").as(idName), col("nt").as("n_tokens"),
        (floor(col("slp").cast("double") / (lit(1e4) * col("nt")) * lit(1e6)
          + lit(0.5)) / lit(1e6)).as("avg_surprisal"))
  }
}
