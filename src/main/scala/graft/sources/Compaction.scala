package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance file layout — the jobs that keep a 100 TB
  * parquet corpus scannable:
  *
  *  - **compaction**: streaming/incremental ingest leaves thousands
  *    of KB-sized files; scan cost is then dominated by per-file
  *    open/footer overhead and the driver's file listing. Compaction
  *    rewrites a directory into ~targetBytes files.
  *  - **clustered write**: `partitionBy` on a low-cardinality column
  *    gives directory-level partition PRUNING; sorting within
  *    partitions by a scan predicate column tightens parquet
  *    row-group min/max bounds so selective scans skip pages
  *    (data skipping) — the poor-man's Z-order for one sort key.
  *
  * Reference scope: the reference checkpoints steps as single CSV
  * files (/root/reference/x2.2.py:361-405, reloaded at 249-256) —
  * file-layout management is a no-op at
  * that scale and a first-class operator at this one.
  *
  * Both are one distributed write job; the only driver-side values
  * are the directory's total byte size (from the file listing the
  * write needs anyway) and the target file count.
  */
object Compaction {

  /** Total on-disk bytes of a parquet directory (driver-side listing
    * — the same listing any scan performs).
    */
  def dirBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else f.length()
    walk(new java.io.File(dir))
  }

  /** Rewrite `inDir` (parquet) into `outDir` as ~`targetBytes`-sized
    * files. Returns the file count written. Uses `coalesce` — a
    * NARROW repartitioning (no shuffle): tasks read several input
    * files and write one output each.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): Int = {
    val n = math.max(1, math.ceil(dirBytes(inDir).toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).coalesce(n)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    parquetFiles(outDir).size
  }

  /** Directory-partitioned, sorted-within-partition write:
    * `partitionBy(partCol)` pruning + tight `sortCol` row-group
    * bounds. Hash-repartitioning on the partition column sends each
    * partition value to one task → one sorted file per partition
    * directory (AQE splits a skewed value across tasks, giving that
    * directory several files, each still sorted).
    */
  def clusteredWrite(df: DataFrame, outDir: String, partCol: String,
                     sortCol: String): Unit =
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCol).parquet(outDir)

  /** Z-value of two numeric columns: each is range-normalized to 16
    * bits against the relation's own [min, max] (a 1-row broadcast
    * aggregate — no data-dependent window), then bit-interleaved with
    * the standard mask-spread ladder. Rows close in BOTH dimensions
    * get close z-values, so range-partitioning + sorting by z gives
    * every file a tight bounding BOX — a 2-D predicate prunes files
    * on either or both dimensions, where a linear sort key prunes on
    * one only. Pure integer column arithmetic: deterministic on any
    * engine/partitioning.
    */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
             loA: org.apache.spark.sql.Column, hiA: org.apache.spark.sql.Column,
             loB: org.apache.spark.sql.Column, hiB: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    def norm16(v: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
               hi: org.apache.spark.sql.Column) =
      when(hi === lo, lit(0L)).otherwise(
        ((v.cast("double") - lo) / (hi - lo) * 65535.0).cast("long"))
    def spread(x: org.apache.spark.sql.Column) = {
      val s8 = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s4 = s8.bitwiseOR(shiftleft(s8, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s2 = s4.bitwiseOR(shiftleft(s4, 2)).bitwiseAND(lit(0x33333333L))
      s2.bitwiseOR(shiftleft(s2, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(norm16(a, loA, hiA)).bitwiseOR(shiftleft(spread(norm16(b, loB, hiB)), 1))
  }

  /** Z-order clustered write: range-partition and sort by the
    * interleaved z-value of two scan-predicate columns, so selective
    * predicates on EITHER column (or a box on both) skip most files
    * via parquet min/max stats. The column bounds come from one
    * 1-row aggregate joined back as a broadcast — two scans total,
    * no window, no driver-side data beyond the bounds row.
    */
  def zOrderedWrite(df: DataFrame, outDir: String, colA: String,
                    colB: String, numFiles: Int): Unit = {
    val bounds = df.agg(
      min(col(colA)).as("__loa"), max(col(colA)).as("__hia"),
      min(col(colB)).as("__lob"), max(col(colB)).as("__hib"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", zValue(col(colA), col(colB),
        col("__loa"), col("__hia"), col("__lob"), col("__hib")))
      .drop("__loa", "__hia", "__lob", "__hib")
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }

  def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(new java.io.File(dir))
  }
}
