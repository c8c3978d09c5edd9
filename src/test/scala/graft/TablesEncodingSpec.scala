package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The driver has regenerated `events.parquet` with different physical
  * timestamp encodings across rounds (TIMESTAMP(NANOS) → read as long
  * nanos under the legacy flag; TIMESTAMP(µs, isAdjustedToUTC=false) →
  * read as TIMESTAMP_NTZ). A 100 TB lake has mixed parquet writers, so
  * `Tables.events` must normalize every variant to TimestampType with
  * identical epoch values — this spec pins that contract so the next
  * storage-type drift fails here, loudly, instead of erroring eight
  * queries at analysis time.
  */
class TablesEncodingSpec extends SparkSpec {

  /** Three µs-aligned instants (UTC). */
  private val epochMicros = Seq(
    1767225600000000L, // 2026-01-01 00:00:00
    1767225601500000L, // +1.5 s
    1772668800000000L  // 2026-03-03 00:00:00
  )

  private def tmpDir(): String =
    Files.createTempDirectory("graft-enc-").toString

  private def loadEvents(dir: String): DataFrame =
    Tables(spark, dir).events

  private def assertNormalized(dir: String, label: String): Unit = {
    val ev = loadEvents(dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"$label: Tables.events must yield TimestampType, got " +
        ev.schema("ts").dataType)
    val got = ev.orderBy("id")
      .select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == epochMicros,
      s"$label: epoch drift — expected $epochMicros, got $got")
  }

  private def baseDf: DataFrame = {
    import spark.implicits._
    epochMicros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("id", "us")
  }

  test("TIMESTAMP µs (isAdjustedToUTC=true) passes through unchanged") {
    val dir = tmpDir()
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try
      baseDf.select(col("id"), timestamp_micros(col("us")).as("ts"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    assertNormalized(dir, "utc-micros")
  }

  test("TIMESTAMP_NTZ µs (isAdjustedToUTC=false) is cast to TimestampType") {
    val dir = tmpDir()
    // Session is UTC, so reinterpreting the instant as wall-time then
    // back is the identity — exactly the round-trip the loader relies on.
    baseDf.select(col("id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType.typeName == "timestamp_ntz",
      "fixture must really be NTZ-encoded for this arm to be exercised")
    assertNormalized(dir, "ntz-micros")
  }

  test("TIMESTAMP_NTZ under a non-UTC session fails loudly instead of shifting") {
    val dir = tmpDir()
    baseDf.select(col("id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val ex = intercept[IllegalArgumentException](loadEvents(dir))
      assert(ex.getMessage.contains("spark.sql.session.timeZone"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
    // back under UTC the same fixture loads losslessly
    assertNormalized(dir, "ntz-after-restore")
  }

  test("legacy INT96 passes through as TimestampType") {
    val dir = tmpDir()
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try
      baseDf.select(col("id"), timestamp_micros(col("us")).as("ts"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    assertNormalized(dir, "int96")
  }

  test("INT64 nanos-as-long is converted via exact integer division") {
    val dir = tmpDir()
    // Spark cannot write TIMESTAMP(NANOS) parquet; under the
    // nanosAsLong flag such files arrive as LongType, which is also
    // what a raw INT64 write reads back as — the loader arm under
    // test matches on the Spark-read schema, so this is the same path.
    baseDf.select(col("id"), expr("us * 1000L").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertNormalized(dir, "int64-nanos")
  }
}
