package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval composition: fuse k-bounded rankings from
  * different scorers (lexical BM25, embedding cosine, …) into one
  * list — the standard retrieval-augmentation shape where no single
  * scorer dominates.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack et al.): each input ranking
    * contributes 1/(kRrf + rank) per document; documents are returned
    * by descending fused score, top `k`.
    *
    * Inputs are (id, score) relations that are ALREADY k-bounded
    * top-N lists (the output of `bm25TopK` / `bruteTopK` — a
    * TakeOrderedAndProject each), so the unpartitioned rank window
    * here runs over parameter-sized data by contract; RRF over
    * unbounded rankings would be a different operator (and a
    * mistake — fusion quality comes from the head of each list).
    *
    * Determinism / cross-engine parity: ranks tie-break on id; the
    * contribution is floor(1e9/(kRrf+rank)) — an integer, so the
    * fused sum is exact integer math under any aggregation order
    * (the double division is exact-enough that its floor equals the
    * rational floor: the quotient is ≥1/(kRrf+rank) ≥ ~1e-3 away
    * from the next integer, 6 orders beyond double rounding error).
    * The emitted `rrf` double is the integer sum scaled by 1e-9.
    */
  def rrf(rankings: Seq[DataFrame], idName: String, scoreName: String,
          k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty && k >= 1 && kRrf >= 0)
    val contribs = rankings.map { df =>
      val w = Window.orderBy(col(scoreName).desc, col(idName).asc)
      df.select(col(idName), col(scoreName))
        .withColumn("__rk", row_number().over(w))
        .select(col(idName),
          floor(lit(1e9) / (lit(kRrf) + col("__rk"))).cast("long").as("__c"))
    }
    contribs.reduce(_.unionByName(_))
      .groupBy(col(idName))
      .agg(sum(col("__c")).as("fp"), count(lit(1)).as("n_lists"))
      .select(col(idName), col("n_lists"),
        (col("fp").cast("double") / lit(1e9)).as("rrf"))
      .orderBy(col("rrf").desc, col(idName).asc)
      .limit(k)
  }
}
