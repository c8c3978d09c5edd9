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
}
