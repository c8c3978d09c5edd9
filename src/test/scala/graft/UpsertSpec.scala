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
}
