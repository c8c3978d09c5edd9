package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget bins ("sequences") so downstream training reads
  * dense, padding-light batches.
  *
  * Distributed shape: documents are spread over `buckets` independent
  * streams (deterministic key mod — each stream packs in parallel),
  * and within a stream the bin id is the running token count divided
  * by the budget: one window cumsum, no driver-side loop, fully
  * deterministic and therefore oracle-checkable. A document lands in
  * the bin where its first token falls, so a bin may spill past the
  * budget by at most one document — the standard streaming-packing
  * contract (exact first-fit-decreasing is inherently sequential and
  * buys ~1-2% density at corpus scale).
  */
object Packing {

  /** Per-document bin assignment: (idCol, bucket, bin, n_tokens). */
  def packGreedy(docs: DataFrame, id: Column, nTokens: Column,
                 buckets: Int, budgetTokens: Long): DataFrame = {
    require(buckets >= 1 && budgetTokens >= 1)
    val sized = docs.select(id.as("id"),
      pmod(id, lit(buckets.toLong)).as("bucket"),
      nTokens.cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        floor((col("__cum") - col("n_tokens")) / budgetTokens.toDouble).cast("long"))
      .drop("__cum")
  }
}
