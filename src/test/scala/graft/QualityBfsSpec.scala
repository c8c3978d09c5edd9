package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bfs, Quality}

/** Hand-computed cases for the data-quality audit and BFS operators. */
class QualityBfsSpec extends SparkSpec {
  import spark.implicits._

  test("rowChecks: nulls, ranges, accepted values in one pass") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "A"), (2L, "B"), (null, "A"), (99L, "Z"))
      .toDF("v", "flag")
    val out = Quality.rowChecks(df, Seq(
      Quality.RowCheck("not_null", "v", col("v").isNotNull),
      Quality.RowCheck("range", "v", col("v").between(1, 10)),
      Quality.RowCheck("accepted", "flag", col("flag").isin("A", "B"))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // null v fails not_null AND range (null predicate = violation)
    assert(out.toSeq == Seq(
      ("not_null", "v", 1L, 4L), ("range", "v", 2L, 4L),
      ("accepted", "flag", 1L, 4L)))
  }

  test("rowChecks on an empty relation reports 0 violations of 0 rows") {
    val empty = Seq.empty[(java.lang.Long, String)].toDF("v", "flag")
    val out = Quality.rowChecks(empty, Seq(
      Quality.RowCheck("not_null", "v", col("v").isNotNull)))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    // sum over zero rows must coalesce to 0, not null — a threshold
    // compare on the audit row would otherwise NPE
    assert(out.toSeq == Seq(("not_null", 0L, 0L)))
  }

  test("uniqueCheck counts surplus rows; refCheck counts orphans") {
    val child = Seq((1L, "x"), (1L, "y"), (2L, "z"), (3L, "w")).toDF("k", "p")
    val uniq = Quality.uniqueCheck(child, "unique", Seq("k")).collect()(0)
    assert(uniq.getLong(2) == 1L && uniq.getLong(3) == 4L) // one surplus row of k=1
    val parent = Seq(1L, 2L).toDF("k")
    val ref = Quality.refCheck(child, "k", parent, "k", "ref").collect()(0)
    assert(ref.getLong(2) == 1L && ref.getLong(3) == 4L) // k=3 orphaned
  }

  test("quarantine: pass/fail split with named evidence; nulls fail") {
    import Quality.RowCheck
    val df = Seq[(Long, java.lang.Long, String)](
      (1L, 5L, "A"),      // passes both
      (2L, 50L, "A"),     // fails range
      (3L, 5L, "Z"),      // fails accepted
      (4L, null, "Z"))    // fails BOTH (null range is null-hostile)
      .toDF("id", "v", "flag")
    val checks = Seq(
      RowCheck("range", "v", col("v") <= 10),
      RowCheck("accepted", "flag", col("flag").isin("A", "B")))
    val (pass, quar) = Quality.quarantine(df, checks)
    assert(pass.select("id").as[Long].collect().toSeq == Seq(1L))
    val got = quar.select(col("id"), col("failed_checks"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((2L, "range"), (3L, "accepted"), (4L, "range,accepted")))
    // nothing silently dropped: the two sides partition the input
    assert(pass.count() + quar.count() == df.count())
  }

  test("kAnonymity: class sizes and the k cut; NULL forms its own class; guards loud") {
    val df = Seq(
      ("en", "web"), ("en", "web"), ("en", "web"),
      ("fr", "web"),
      (null.asInstanceOf[String], "book"), (null.asInstanceOf[String], "book"))
      .toDF("lang", "source")
    val got = Quality.kAnonymity(df, Seq("lang", "source"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getBoolean(3))).toSet
    assert(got == Set(
      ("en", "web", 3L, false),
      ("fr", "web", 1L, true),
      (null, "book", 2L, true)))
    intercept[IllegalArgumentException](Quality.kAnonymity(df, Nil, 3))
    intercept[IllegalArgumentException](
      Quality.kAnonymity(df, Seq("lang"), k = 1))
  }

  test("lDiversity: distinct-sensitive counts and the l cut; sensitive can't be a quasi-id") {
    val df = Seq(
      ("en", "web"), ("en", "book"), ("en", "web"),
      ("fr", "web"), ("fr", "web"))
      .toDF("lang", "source")
    val got = Quality.lDiversity(df, Seq("lang"), "source", l = 2)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getBoolean(3))).toSet
    // en: 3 rows over {web, book} -> diverse; fr: 2 rows all web -> not
    assert(got == Set(("en", 3L, 2L, true), ("fr", 2L, 1L, false)))
    intercept[IllegalArgumentException](
      Quality.lDiversity(df, Seq("source"), "source", 2))
    intercept[IllegalArgumentException](
      Quality.lDiversity(df, Seq("lang"), "source", 1))
  }

  test("shortestHops: min distance wins, anti-join prevents relabeling") {
    // 1 -> 2 -> 3 -> 4 and a shortcut 1 -> 3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L))
      .map { case (s, d) => (s.toString, d.toString) }.toDF("src", "dst")
    val seeds = Seq("1").toDF("id")
    val out = Bfs.shortestHops(edges, seeds, maxHops = 3)
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(out == Map("1" -> 0, "2" -> 1, "3" -> 1, "4" -> 2))
  }

  test("shortestHops: maxHops bounds the expansion") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val out = Bfs.shortestHops(edges, Seq("a").toDF("id"), maxHops = 1)
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(out == Map("a" -> 0, "b" -> 1))
  }
}
