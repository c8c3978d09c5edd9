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
  /** Content-defined chunking (gear-style, word granularity): a word
    * CLOSES its chunk iff its md5 256-bucket falls below
    * `boundary256`, giving geometrically-distributed chunks of
    * expected length 256/boundary256 words. Boundaries depend only on
    * the word VALUE, never its position: inserting or deleting text
    * re-chunks only the chunk it touches while every following chunk
    * keeps its identity — the shift-robustness fixed windows
    * ([[slidingChunks]], the span family's k-grams) structurally
    * lack, and the reason CDC is the dedup unit of storage systems
    * and sub-document corpus dedup alike.
    *
    * Returns (id, chunk_idx, start_pos, n_words, chunk_md5) — 1-based
    * word positions, chunk text fingerprinted for downstream
    * keep-first joins. Shape at scale: one explode + TWO keyed
    * operations on the document id (the prefix-count window and the
    * chunk aggregation share the same partitioning, so the second is
    * exchange-free); no corpus-wide state. Split mirrors
    * `split(text, " ")` everywhere else in the family — empty words
    * count and hash.
    */
  def cdcChunks(docs: DataFrame, idName: String, text: Column,
                boundary256: Int, withText: Boolean = false): DataFrame = {
    require(boundary256 >= 1 && boundary256 <= 256,
      s"boundary256 $boundary256 must be in [1, 256]")
    import org.apache.spark.sql.expressions.Window
    val words = docs
      .select(col(idName).as("id"),
        posexplode(split(text, " ")).as(Seq("p0", "w")))
      .select(col("id"), (col("p0") + lit(1)).cast("long").as("pos"), col("w"),
        when(conv(substring(md5(col("w")), 1, 2), 16, 10).cast("int")
          < boundary256, lit(1L)).otherwise(lit(0L)).as("__b"))
    // a boundary word ENDS its chunk, so a word's chunk index is the
    // number of boundaries strictly before it
    val win = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val agged = words
      .withColumn("chunk_idx", coalesce(sum(col("__b")).over(win), lit(0L)))
      .groupBy(col("id"), col("chunk_idx"))
      .agg(min(col("pos")).as("start_pos"),
        count(lit(1)).as("n_words"),
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("__ctext"))
      .select(col("id"), col("chunk_idx"), col("start_pos"), col("n_words"),
        md5(col("__ctext")).as("chunk_md5"), col("__ctext"))
    // `withText` serves consumers that REASSEMBLE (segment dedup);
    // fingerprint-only consumers keep the narrow relation
    if (withText) agged.withColumnRenamed("__ctext", "chunk_text")
    else agged.drop("__ctext")
  }

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
