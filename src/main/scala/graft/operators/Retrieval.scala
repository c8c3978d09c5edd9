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
    *
    * `maxN` enforces the bounded-input contract VISIBLY: a ranking
    * with more than `maxN` rows is REJECTED (require), never silently
    * truncated — truncation would drop tail contributions of up to
    * 1e9/(kRrf+rank) per list and change fused scores behind the
    * caller's back. The check is a `limit(maxN+1).count()` per
    * ranking — bounded work on the k-bounded inputs the contract
    * expects; a caller fusing genuinely longer lists passes a larger
    * `maxN` explicitly (and with it accepts the bigger, still
    * bounded, single-partition rank sort). The `limit(maxN)` stays in
    * the plan so the unpartitioned window's input is bounded by
    * construction even if the relation is re-evaluated nondeterministically.
    */
  def rrf(rankings: Seq[DataFrame], idName: String, scoreName: String,
          k: Int, kRrf: Int = 60, maxN: Int = 1024): DataFrame = {
    // maxN may sit below k: with L input lists the fused candidate
    // pool is up to L*maxN distinct ids, and a short pool simply
    // returns fewer than k rows — not an error
    require(rankings.nonEmpty && k >= 1 && kRrf >= 0 && maxN >= 1)
    rankings.zipWithIndex.foreach { case (df, i) =>
      val n = df.select(col(idName)).limit(maxN + 1).count()
      require(n <= maxN,
        s"rrf: input ranking #$i exceeds maxN=$maxN rows — RRF fuses " +
          "k-bounded top-N lists; pre-truncate the ranking or pass a " +
          "larger maxN (silent truncation would change fused scores)")
    }
    val contribs = rankings.map { df =>
      val w = Window.orderBy(col(scoreName).desc, col(idName).asc)
      df.select(col(idName), col(scoreName))
        .orderBy(col(scoreName).desc, col(idName).asc).limit(maxN)
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
