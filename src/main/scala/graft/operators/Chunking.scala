package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — split each document into
  * overlapping fixed-size token windows (context-length-sized
  * training examples with stride overlap, the step between raw docs
  * and sequence packing).
  *
  * Declarative explode: `sequence(0, n-1, stride)` generates chunk
  * starts, `slice` cuts each window out of the token array — all
  * codegen'd array functions inside one projection, then a single
  * explode. Rows expand by ~n_tokens/stride; no shuffle at all — the
  * operator is embarrassingly parallel and chunk rows inherit the
  * parent scan's partitioning, which is exactly what a 100 TB
  * chunking pass needs (the expansion stays inside each task).
  */
object Chunking {

  /** One row per (doc, chunk): `chunk_idx` (0-based), `chunk_tokens`
    * (window length — the final window is the short remainder), and
    * the chunk text. A trailing window shorter than `stride` tokens
    * still emits (training pipelines usually drop or pad it — that's
    * a downstream filter).
    */
  def slidingChunks(docs: DataFrame, idName: String, text: Column,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride($stride) <= chunkSize($chunkSize)")
    docs
      .select(col(idName), split(text, " ").as("__toks"))
      .withColumn("__nt", size(col("__toks")))
      .withColumn("__st",
        explode(sequence(lit(0), col("__nt") - 1, lit(stride))))
      .select(col(idName),
        (col("__st") / lit(stride)).cast("long").as("chunk_idx"),
        slice(col("__toks"), col("__st") + 1,
          least(lit(chunkSize), col("__nt") - col("__st"))).as("__ctoks"))
      .select(col(idName), col("chunk_idx"),
        size(col("__ctoks")).cast("long").as("chunk_tokens"),
        concat_ws(" ", col("__ctoks")).as("chunk_text"))
  }
}
