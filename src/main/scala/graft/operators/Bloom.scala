package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter as a TABLE: membership state for a huge
  * key set compressed to an (mBits/64)-row (word_idx, word) relation
  * that broadcasts where the key set itself never could.
  *
  * The 100 TB use case is the incremental-ingest pre-filter: the
  * archive's fingerprint set is billions of rows (the q89 anti-join
  * shuffles the whole batch against it), but its Bloom table at
  * m = 10·n bits is ~n·1.25 bytes — gigabytes, partitionable, and the
  * per-batch probe becomes a broadcast hash join + bitmask check that
  * eliminates the definitely-new rows inside the scan stage. Only the
  * might-contain survivors (≈ true dups + FPR·batch) pay the exact
  * anti-join. No false negatives by construction: a dropped row is
  * GUARANTEED absent from the archive.
  *
  * Determinism: k derived hash positions per key via
  * xxhash64(key, seed) — fixed seeds, no RNG state — so the same key
  * set always builds the identical word table on any engine/retry/
  * partitioning. Build is explode(k) + one groupBy(word_idx) bit_or:
  * fully partial-aggregable, output bounded by mBits/64 rows
  * regardless of input cardinality.
  */
object Bloom {

  /** Build the Bloom word table over `key`: rows (word_idx: long,
    * word: long) covering only non-zero words. `mBits` is rounded up
    * to a multiple of 64.
    */
  def build(df: DataFrame, key: Column, mBits: Long, k: Int): DataFrame = {
    require(k >= 1 && k <= 16 && mBits >= 64)
    val m = ((mBits + 63) / 64) * 64
    val positions = (0 until k).map(i =>
      pmod(xxhash64(key, lit(i)), lit(m)))
    df.select(explode(array(positions: _*)).as("__pos"))
      // pos >> 6 / pos & 63: pure bit ops — no fp division anywhere
      .select(shiftrightunsigned(col("__pos"), 6).as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos & 63 AS INT))").as("__bit"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(__bit)").as("word"))
  }

  /** Probe: append a `might_contain` boolean to `probe` rows. A row
    * might be in the built set iff ALL k bit positions are set.
    * The bloom table joins BROADCAST on word_idx after the probe side
    * explodes its k positions — k small rows per probe row, matched
    * against an mBits/64-row build side; the verdict folds back with
    * one partial-aggregable min(). `mBits`/`k` must match `build`.
    *
    * PRECONDITION: probe rows must be distinct — the fold-back groups
    * by all probe columns, so duplicate rows collapse to one output
    * row (keyed relations, the intended callers, always satisfy
    * this). All working columns are `__bloom_`-prefixed and the bloom
    * side is renamed before the join; a probe relation that itself
    * contains a `__bloom_*` column is rejected rather than silently
    * mis-grouped.
    */
  def mightContain(probe: DataFrame, key: Column, bloom: DataFrame,
                   mBits: Long, k: Int): DataFrame = {
    require(k >= 1 && k <= 16 && mBits >= 64)
    val m = ((mBits + 63) / 64) * 64
    val cols = probe.columns
    require(!cols.exists(_.startsWith("__bloom_")),
      s"probe columns collide with bloom working names: " +
        cols.filter(_.startsWith("__bloom_")).mkString(","))
    require(!cols.contains("might_contain"),
      "probe already has a might_contain column")
    val positions = (0 until k).map(i =>
      pmod(xxhash64(key, lit(i)), lit(m)))
    // bloom side renamed to the reserved prefix BEFORE the join, so a
    // probe relation named word/word_idx joins cleanly
    val b = bloom.select(col("word_idx").as("__bloom_widx"),
      col("word").as("__bloom_word"))
    probe
      .withColumn("__bloom_pos", explode(array(positions: _*)))
      .withColumn("__bloom_widx", shiftrightunsigned(col("__bloom_pos"), 6))
      .withColumn("__bloom_bit",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__bloom_pos & 63 AS INT))"))
      .join(broadcast(b), Seq("__bloom_widx"), "left")
      .withColumn("__bloom_hit",
        coalesce(col("__bloom_word").bitwiseAND(col("__bloom_bit")) =!= 0,
          lit(false)))
      .groupBy(cols.map(col): _*)
      .agg(min(col("__bloom_hit")).as("might_contain"))
  }

  /** The pre-filtered incremental dedup: rows of `batch` whose key
    * Bloom-misses the archive are definitely new and skip the exact
    * check; only might-contain rows anti-join the archive key set.
    * For a DISTINCT-row batch (the `mightContain` precondition, which
    * this inherits) the output is set-equal to the plain anti-join —
    * Bloom has no false negatives, so no new row is lost and no
    * archived row survives. Duplicate batch rows would collapse via
    * the probe's fold-back groupBy, so multiplicity is NOT preserved
    * for non-distinct batches. Cost = scan + broadcast probe +
    * anti-join over the small survivor set.
    */
  def prefilteredAntiJoin(batch: DataFrame, batchKey: String,
                          archiveKeys: DataFrame, archiveKey: String,
                          mBits: Long, k: Int): DataFrame = {
    val bloom = build(archiveKeys, col(archiveKey), mBits, k)
    val flagged = mightContain(batch, col(batchKey), bloom, mBits, k)
    val definiteNew = flagged.filter(!col("might_contain")).drop("might_contain")
    val suspects = flagged.filter(col("might_contain")).drop("might_contain")
      .join(archiveKeys.select(col(archiveKey).as(batchKey)).distinct(),
        Seq(batchKey), "left_anti")
    definiteNew.unionByName(suspects)
  }
}
