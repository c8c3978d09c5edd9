package graft

import graft.operators.Upsert

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "name", "v")

  test("scd1: delta wins, base-only survives, delta-only inserts") {
    val delta = Seq((2L, "B!", 99L), (4L, "d", 40L)).toDF("id", "name", "v")
    val out = Upsert.scd1(base, delta, "id")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 10L), (2L, "B!", 99L), (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("scd1: a NULL in the delta updates TO null (no coalesce bug)") {
    val delta = Seq((3L, null.asInstanceOf[String], 31L)).toDF("id", "name", "v")
    val out = Upsert.scd1(base, delta, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.get(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, "a", 10L), (2L, "b", 20L), (3L, null, 31L)))
  }

  test("cdcDiff classifies insert/delete/update/unchanged") {
    val next = Seq(
      (2L, "b", 20L),   // unchanged
      (3L, "c", 99L),   // update
      (4L, "d", 40L))   // insert; id=1 deleted
      .toDF("id", "name", "v")
    val out = Upsert.cdcDiff(base, next, "id")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "delete"), (2L, "unchanged"), (3L, "update"), (4L, "insert")))
  }

  test("cdcDiff: null-safe value compare (null == null is unchanged)") {
    val p = Seq((1L, null.asInstanceOf[String])).toDF("id", "name")
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "name")
    assert(Upsert.cdcDiff(p, n, "id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "unchanged")))
  }

  private def hist(rows: (Long, String, Long, Long, Option[Long])*) = {
    import org.apache.spark.sql.functions.col
    rows.toSeq.toDF("id", "name", "v", "valid_from", "valid_to")
      .select(col("id"), col("name"), col("v"), col("valid_from"),
        col("valid_to").cast("long").as("valid_to"))
  }

  test("scd2Apply rejects a key-only snapshot with a clear message") {
    import spark.implicits._
    val h = Seq((1L, 100L, Option.empty[Long])).toDF("id", "valid_from", "valid_to")
    val snap = Seq(Tuple1(1L)).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Upsert.scd2Apply(h, snap, "id", asOf = 200L)
    }
    assert(e.getMessage.contains("non-key column"))
  }

  test("scd2Apply: update closes+opens, delete closes, insert opens, unchanged rides") {
    val h = hist(
      (1L, "a", 10L, 100L, None),        // unchanged in snapshot
      (2L, "b", 20L, 100L, None),        // updated
      (3L, "c", 30L, 100L, None),        // deleted
      (2L, "b0", 19L, 50L, Some(100L)))  // closed history: immutable
    val snap = Seq(
      (1L, "a", 10L), (2L, "B!", 99L), (4L, "d", 40L)).toDF("id", "name", "v")
    val out = Upsert.scd2Apply(h, snap, "id", asOf = 200L)
      .orderBy("id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, "a", 10L, 100L, -1L),    // unchanged: open row untouched
      (2L, "b0", 19L, 50L, 100L),   // closed history preserved
      (2L, "b", 20L, 100L, 200L),   // old value closed at asOf
      (2L, "B!", 99L, 200L, -1L),   // new value opened at asOf
      (3L, "c", 30L, 100L, 200L),   // delete = close
      (4L, "d", 40L, 200L, -1L)))   // insert = open
  }

  test("scd2Apply closeMissing=false: unobserved keys ride through open") {
    val h = hist((1L, "a", 10L, 100L, None), (2L, "b", 20L, 100L, None))
    val snap = Seq((1L, "A", 9L)).toDF("id", "name", "v") // id=2 unobserved
    val out = Upsert.scd2Apply(h, snap, "id", asOf = 200L, closeMissing = false)
      .orderBy("id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, "a", 10L, 100L, 200L), (1L, "A", 9L, 200L, -1L),
      (2L, "b", 20L, 100L, -1L))) // NOT closed
  }

  test("scd2Apply is idempotent: re-applying the same snapshot changes nothing") {
    val h = hist((1L, "a", 10L, 100L, None), (2L, "b", 20L, 100L, None))
    val snap = Seq((1L, "a", 11L), (3L, "c", 30L)).toDF("id", "name", "v")
    val once = Upsert.scd2Apply(h, snap, "id", asOf = 200L)
    val twice = Upsert.scd2Apply(once, snap, "id", asOf = 300L)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id", "valid_from")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    assert(norm(twice) == norm(once))
  }

  test("incrementalAggMerge: hand case with base-only, delta-only, and shared keys") {
    import org.apache.spark.sql.functions.col
    val base = Seq(("a", 2L, 10L, 3L, 7L), ("b", 1L, 5L, 5L, 5L))
      .toDF("k", "n", "s", "mn", "mx")
    val delta = Seq(("b", 3L, 30L, 1L, 20L), ("c", 1L, 9L, 9L, 9L))
      .toDF("k", "n", "s", "mn", "mx")
    val out = Upsert.incrementalAggMerge(base, delta, Seq("k"),
        counts = Seq("n"), sums = Seq("s"), mins = Seq("mn"), maxs = Seq("mx"))
      .orderBy("k").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 2L, 10L, 3L, 7L),    // base-only: unchanged
      ("b", 4L, 35L, 1L, 20L),   // folded
      ("c", 1L, 9L, 9L, 9L)))    // delta-only: inserted
  }

  test("incrementalAggMerge ≡ full recompute on the fixture corpus") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def roll(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("lang")).agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("s"), min(col("n_chars")).as("mn"),
        max(col("n_chars")).as("mx"))
    val merged = Upsert.incrementalAggMerge(
        roll(docs.filter(col("doc_id") % 4 === 0)),
        roll(docs.filter(col("doc_id") % 4 =!= 0)), Seq("lang"),
        counts = Seq("n"), sums = Seq("s"), mins = Seq("mn"), maxs = Seq("mx"))
      .orderBy("lang").collect().toSeq
    assert(merged == roll(docs).orderBy("lang").collect().toSeq && merged.nonEmpty)
  }

  test("scd2Apply: at most one open row per key, and intervals nest correctly") {
    val h = hist(
      (1L, "a", 1L, 100L, None), (2L, "b", 2L, 100L, None),
      (3L, "c", 3L, 100L, None), (1L, "a0", 0L, 50L, Some(100L)))
    val snap = Seq((1L, "A", 9L), (2L, "b", 2L), (4L, "d", 4L)).toDF("id", "name", "v")
    val out = Upsert.scd2Apply(h, snap, "id", asOf = 200L)
    import org.apache.spark.sql.functions._
    val open = out.filter(col("valid_to").isNull)
      .groupBy("id").count().filter(col("count") > 1).count()
    assert(open == 0)
    val inverted = out.filter(col("valid_to").isNotNull &&
      col("valid_to") <= col("valid_from")).count()
    assert(inverted == 0)
  }
}
