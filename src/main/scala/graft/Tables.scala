package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Typed loaders for the harness star schema + pipeline tables
  * (see repo:FIXTURES.md). One parquet file per table under `dir`.
  *
  * Every loader is a plain parquet scan so Catalyst gets full
  * predicate pushdown / column pruning; at cluster scale these would
  * be partitioned tables and the same code holds (partition pruning
  * composes with the pushed filters).
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame    = t("region")
  def nation: DataFrame    = t("nation")
  def customer: DataFrame  = t("customer")
  def supplier: DataFrame  = t("supplier")
  def part: DataFrame      = t("part")
  def orders: DataFrame    = t("orders")
  def lineitem: DataFrame  = t("lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read natively; with `nanosAsLong` it arrives as LongType nanos.
    * The data is µs-aligned (verified: epoch_ns % 1000 == 0 across
    * the testdata), so timestamp_micros(ns/1000) is lossless and
    * matches DuckDB's µs view of the same file.
    *
    * The session must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (all entry points —
    * Verify, Bench, the specs — set it); a loader that silently
    * flipped session conf would surprise the second session to touch
    * it, so this one only verifies.
    */
  def events: DataFrame = {
    require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .contains("true"),
      "events.parquet is TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true")
    val raw = t("events")
    // `ts / 1000` would be DOUBLE division: ns-epoch magnitudes
    // (~1.7e18) exceed 2^53, so the rounded quotient is off by up to
    // ±1 µs. `div` is exact integer division on longs.
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
