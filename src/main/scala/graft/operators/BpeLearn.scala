package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Distributed BPE (byte-pair-encoding) merge learning — the
  * vocabulary-training half of the tokenizer a data pipeline ships
  * with its corpus (the reference has no tokenizer surface; this is
  * north-star LLM-pipeline work like the subword splitter q45 it
  * feeds).
  *
  * Shape per merge step (classic Sennrich BPE, word-internal):
  *  - the corpus state is the DISTINCT-WORD relation
  *    (word, n, seq: array<symbol>) — corpus-sized text never
  *    re-parses after step 0, and every step is one explode +
  *    one partial-aggregable keyed count over that relation;
  *  - the argmax pair (count desc, then lexicographic — fully
  *    deterministic) is ONE collected row per step: the only
  *    driver-side state is the merge table itself, parameter-sized
  *    by construction (numMerges rows);
  *  - applying the merge rewrites each word's symbol array IN-TASK
  *    with a left-to-right greedy fold (`aggregate` HOF) — no
  *    shuffle, and the state relation is re-materialized per step so
  *    the lineage stays one step deep.
  *
  * At 100 TB the distinct-word relation is the classic "vocabulary
  * table" (orders of magnitude smaller than the corpus); the
  * per-step shuffle keys on the pair, and AQE handles the hot-pair
  * skew. Cost is numMerges × one aggregation — the same loop
  * discipline as PageRank's iterations.
  */
object BpeLearn {

  /** Adjacent symbol pairs of `seq` as "a b" strings (empty for
    * single-symbol sequences).
    */
  private def adjacentPairs(seq: Column): Column =
    zip_with(
      slice(seq, lit(1), size(seq) - 1),
      slice(seq, lit(2), size(seq) - 1),
      (a, b) => concat(a, lit(" "), b))

  /** Greedy left-to-right application of merge (a, b) → a+b to a
    * symbol array: fold each symbol into the output, replacing a
    * trailing `a` when the incoming symbol is `b`. A freshly merged
    * token never re-merges as the LEFT element in the same pass
    * (out's tail is the merged "ab", not "a") — the standard BPE
    * apply order, so "a a a" under (a,a) becomes ["aa", "a"].
    */
  private def applyMerge(seq: Column, a: String, b: String): Column =
    aggregate(seq, array().cast("array<string>"), (out, x) =>
      when(size(out) > 0 &&
          element_at(out, -1) === lit(a) && x === lit(b),
        concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))))
        .otherwise(concat(out, array(x))))

  /** Learn `numMerges` merges from the corpus. Returns the merge
    * table (step, left, right, merged, pair_count) in learned order.
    * Stops early if no pair occurs at least twice.
    */
  def learnMerges(docs: DataFrame, text: Column, numMerges: Int): DataFrame = {
    require(numMerges >= 1 && numMerges <= 64,
      s"numMerges $numMerges out of [1,64] — the merge table is driver state")
    val spark = docs.sparkSession
    // distinct-word state: word weight n, seq = characters
    var state = docs.select(explode(TextFns.tokens(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(col("n"), split(col("w"), "").as("seq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    // ONE job per step: the argmax aggregation's evaluation is what
    // materializes the current state's cache (its lineage is one
    // applyMerge projection over the PREVIOUS cached state), so no
    // separate count() materialization job runs. The previous state
    // unpersists only AFTER the argmax returns — its child is cached
    // by then, so nothing ever recomputes more than one step of
    // lineage (a 2-deep sliding persist window; measured: the count()
    // twin cost q144 ~2 s/board at sf0.1, PERF_NOTES r14).
    var prev: Option[DataFrame] = None
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val top = state
        .select(col("n"), explode(adjacentPairs(col("seq"))).as("p"))
        .groupBy(col("p")).agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("p").asc)
        .limit(1).collect()
      prev.foreach(_.unpersist(blocking = false))
      prev = None
      if (top.isEmpty || top(0).getLong(1) < 2) done = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges += ((step, a, b, top(0).getLong(1)))
        val next = state
          .select(col("n"), applyMerge(col("seq"), a, b).as("seq"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        prev = Some(state)
        state = next
        step += 1
      }
    }
    prev.foreach(_.unpersist(blocking = false))
    state.unpersist(blocking = false)
    import spark.implicits._
    merges.toSeq.toDF("step", "left", "right", "pair_count")
      .select(col("step"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
  }

  /** Encode: tokenize each document with a learned merge table — the
    * APPLY half of the tokenizer ([[learnMerges]] is the training
    * half). Merges apply in step order, each as one full greedy
    * left-to-right pass over every word — the classic BPE encode
    * order, so encoding a training corpus with its own merge table
    * reproduces the final training state exactly (pinned in
    * BpeLearnSpec).
    *
    * The kernel is pure string expressions: each word renders as the
    * space-delimited symbol string " c1 c2 … " and each merge is one
    * greedy left-to-right pass, realized by the cheapest exact
    * expression per merge SHAPE:
    *
    *  - a ≠ b (the common case): TWO `replace(" a b " → " ab ")`
    *    passes. `replace` scans left to right without rescanning
    *    replaced output, but consumes the trailing boundary space, so
    *    string-adjacent matches in a chain (" a b a b ") skip every
    *    other occurrence; the skipped matches are isolated after pass
    *    1 (both neighbors consumed) and pass 2 takes them all —
    *    equal to the greedy pass exactly, at plain-substring cost.
    *  - a == b (self-merge): ONE `regexp_replace` with the
    *    literal-quoted pattern `\Q a a\E(?= )` → " aa". The lookahead
    *    leaves the boundary space unconsumed, so the regex engine's
    *    leftmost-first non-overlapping scan pairs a ≥ 3-symbol run
    *    off the left with the odd symbol at the END — the alignment
    *    the two-pass replace gets wrong ([aa, a, aa] instead of
    *    [aa, aa, a] on five a's), and exactly what the greedy fold
    *    computes. Regex costs ~3× plain replace, paid only on the
    *    rare self-merge steps.
    *
    * Both shapes match [[applyMerge]] / [[encodeLocal]] symbol for
    * symbol (spec-pinned on adversarial chains, learned tables,
    * self-merge runs, and regex-metacharacter symbols). A freshly
    * merged token cannot act as the LEFT element of a later match in
    * the same pass (its text was consumed) — the standard BPE apply
    * order.
    *
    * The whole chain stays inside whole-stage codegen in the scan
    * stage: no shuffle, no UDF, no driver state beyond the
    * parameter-sized merge list itself. At 100 TB this is the
    * map-side tokenization pass a training-data pipeline runs last;
    * per-doc output is (id, tokens array per word) — aggregate
    * downstream for budget math (q145's n_tok becomes real subword
    * counts).
    *
    * Returns one row per (id, word position): (id, tokens:
    * array<string>) — word order within a doc is not preserved in
    * the relation (callers aggregate per id).
    */
  def encode(docs: DataFrame, idName: String, text: Column,
             merges: Seq[(String, String)]): DataFrame = {
    require(merges.forall { case (a, b) =>
      a.nonEmpty && b.nonEmpty && !a.contains(" ") && !b.contains(" ") },
      "merge symbols must be non-empty and space-free")
    val spaced = concat(lit(" "), array_join(split(col("__w"), ""), " "), lit(" "))
    def replacePass(s: Column, a: String, b: String): Column =
      call_function("replace", s, lit(s" $a $b "), lit(s" ${a + b} "))
    def pass(s: Column, a: String, b: String): Column =
      if (a != b) replacePass(replacePass(s, a, b), a, b)
      else regexp_replace(s,
        lit(java.util.regex.Pattern.quote(s" $a $b") + "(?= )"),
        lit(java.util.regex.Matcher.quoteReplacement(s" ${a + b}")))
    val enc = merges.foldLeft(spaced) { case (s, (a, b)) => pass(s, a, b) }
    docs.select(col(idName), explode(TextFns.tokens(text)).as("__w"))
      .filter(length(col("__w")) > 0)
      .select(col(idName), split(trim(enc), " ").as("tokens"))
  }

  /** Sequential reference encoder (spec oracle for [[encode]]):
    * greedy left-to-right pass per merge, in merge order.
    */
  private[graft] def encodeLocal(word: String,
                                 merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.split("").toSeq.filter(_.nonEmpty)) { case (seq, (a, b)) =>
      seq.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    }

  /** Sequential reference implementation (spec oracle). */
  private[graft] def learnMergesLocal(words: Seq[(String, Long)],
                                      numMerges: Int): Seq[(Int, String, String, Long)] = {
    var state: Seq[(Seq[String], Long)] =
      words.map { case (w, n) => (w.split("").toSeq, n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (seq, n) =>
        seq.zip(seq.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a + " " + b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          out += ((step, a, b, c))
          state = state.map { case (seq, n) =>
            val folded = seq.foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == a && x == b)
                acc.init :+ (a + b)
              else acc :+ x
            }
            (folded, n)
          }
          step += 1
        case _ => done = true
      }
    }
    out.toSeq
  }
}
