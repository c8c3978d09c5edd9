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
  * files (utils.py:20-30) — file-layout management is a no-op at
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

  def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(new java.io.File(dir))
  }
}
