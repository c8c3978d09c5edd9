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
    // ZERO-SHUFFLE shape: the chunk decomposition of a document is a
    // pure function of its own word array, so the whole operator is
    // one projection (boundary positions via array HOFs, one chunk
    // struct per index) plus one explode — chunk rows inherit the
    // parent scan's partitioning, like [[slidingChunks]]. The previous
    // shape exploded per WORD and ran a prefix-sum window + regroup,
    // i.e. a full word-level exchange of the corpus — at 100 TB that
    // shuffle moved every word once to compute a per-document
    // decomposition (optimization guide §2.4). Output rows, values,
    // and types are identical: a boundary word (md5 256-bucket <
    // boundary256) ENDS its chunk, a trailing boundary leaves no empty
    // chunk, and `chunk_md5` fingerprints the space-joined chunk text.
    // STAGED PROJECTIONS, deliberately: every lambda below references
    // only BOUND COLUMNS (`__w`, `__ends`, `__n`, `__m`), never an
    // expression tree — an expression referenced inside a HOF lambda
    // re-evaluates per ELEMENT, and `__ends` itself costs a full
    // per-word md5 pass (measured: the inlined form was ~4× the whole
    // query — the q73 HOF-re-evaluation trap, PERF_NOTES r4).
    val w = split(text, " ")
    val staged = docs
      .select(col(idName).as("id"), w.as("__w"))
      // 1-based end positions of boundary words, ascending
      .withColumn("__ends", filter(
        transform(col("__w"), (x, i) =>
          when(conv(substring(md5(x), 1, 2), 16, 10).cast("int")
            < boundary256, i + 1).otherwise(lit(null))),
        x => x.isNotNull))
      .withColumn("__n", size(col("__w")))
      .withColumn("__m", size(col("__ends")))
    val n = col("__n")
    val m = col("__m")
    val ends = col("__ends")
    // chunk k spans [startK, endK]: startK = 1 (k=0) or ends[k]+1;
    // endK = ends[k+1] (k < m) or n (the trailing remainder, which
    // exists only when the last word is not a boundary)
    val nChunks = m + when(m === 0 || element_at(ends, -1) < n, 1)
      .otherwise(0)
    def startK(k: Column) =
      when(k === 0, lit(1)).otherwise(element_at(ends, k) + 1)
    def endK(k: Column) =
      when(k < m, element_at(ends, k + 1)).otherwise(n)
    val chunkArr = transform(sequence(lit(0), nChunks - 1), k =>
      struct(
        k.cast("long").as("chunk_idx"),
        startK(k).cast("long").as("start_pos"),
        (endK(k) - startK(k) + 1).cast("long").as("n_words"),
        array_join(slice(col("__w"), startK(k), endK(k) - startK(k) + 1), " ")
          .as("__ctext")))
    val agged = staged
      .select(col("id"), explode(chunkArr).as("__c"))
      .select(col("id"), col("__c.chunk_idx").as("chunk_idx"),
        col("__c.start_pos").as("start_pos"),
        col("__c.n_words").as("n_words"),
        md5(col("__c.__ctext")).as("chunk_md5"),
        col("__c.__ctext").as("__ctext"))
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
