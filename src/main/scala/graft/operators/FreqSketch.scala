package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch frequency estimation — the bounded-memory
  * frequency table a 100 TB pipeline keeps where the exact
  * token→count map would not fit: estimated counts are guaranteed
  * `exact ≤ est ≤ exact + eps·N` with probability `confidence`.
  * Completes the sketch family alongside HLL distinct counts (q40 /
  * q87), GK percentiles (q83) and approx_top_k (q91).
  *
  * Scale shape: `count_min_sketch` is a partial-aggregable Spark
  * aggregate — every task sketches its partition and the counters
  * SUM under merge (associative, order-independent), so one
  * parameter-sized binary (~depth·width·8 bytes, ~100 KB at
  * eps=1e-3) leaves the cluster regardless of input size. Reading
  * the estimates back is a driver-side deserialize of that one
  * binary + a broadcast lookup — the IVF-centroid pattern: collects
  * are parameter-sized, never data-sized.
  */
object FreqSketch {

  /** The merged sketch over `item`, as one binary. (One job; the
    * only collect is the parameter-sized sketch itself.)
    */
  def cmsBytes(items: DataFrame, item: Column, eps: Double,
               confidence: Double, seed: Int): Array[Byte] =
    items.agg(count_min_sketch(item, lit(eps), lit(confidence), lit(seed))
      .as("sk")).head().getAs[Array[Byte]](0)

  /** Exact top-k items by count (deterministic count-desc/item-asc
    * order) annotated with the sketch's estimate for each — the
    * validation harness for the sketch path: `est_n` must bound
    * `exact_n` from above by at most eps·N.
    */
  def estimateTopK(items: DataFrame, item: Column, k: Int, eps: Double,
                   confidence: Double, seed: Int): DataFrame =
    estimateTopKWithTotal(items, item, k, eps, confidence, seed)._1

  /** [[estimateTopK]] plus the sketch's own stream length
    * (CountMinSketch.totalCount — the N in the eps·N error bound),
    * read from the one merged binary instead of a second corpus
    * scan. Callers asserting the accuracy contract take this form.
    */
  def estimateTopKWithTotal(items: DataFrame, item: Column, k: Int,
                            eps: Double, confidence: Double, seed: Int)
      : (DataFrame, Long) = {
    val bytes = cmsBytes(items, item, eps, confidence, seed)
    val spark = items.sparkSession
    val bc = spark.sparkContext.broadcast(bytes)
    // scalar UDF over k rows; the sketch object is lazily rebuilt
    // per executor from the broadcast binary
    val est = udf { (s: String) =>
      FreqSketch.cached(bc.value).estimateCount(s)
    }
    val top = items.groupBy(item.as("item"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("item").asc)
      .limit(k)
      .withColumn("est_n", est(col("item")))
    (top, cached(bytes).totalCount())
  }

  // deserialize once per executor (keyed by identity of the
  // broadcast value, which is stable within an executor)
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Integer, CountMinSketch]()
  private def cached(bytes: Array[Byte]): CountMinSketch =
    cache.computeIfAbsent(System.identityHashCode(bytes),
      _ => CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes)))
}
