package graft

import org.apache.spark.sql.functions._
import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {

  test("profileTable: nulls, distincts-exclude-nulls, native-typed min/max") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("en"), 10.5), (2L, Some("de"), 2.0), (3L, None, 10.5),
      (4L, Some("en"), -1.0)).toDF("id", "lang", "score")
    val got = Profiling.profileTable(df, Seq("id", "lang", "score"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    // COUNT(DISTINCT) excludes the null; n_null counts it
    assert(got("lang") == ((4L, 1L, 2L, "de", "en")))
    // min/max computed NUMERICALLY before the render (-1.0 < 10.5
    // numerically but not lexicographically)
    assert(got("score") == ((4L, 0L, 3L, "-1.0", "10.5")))
    // deterministic row order: col_name ascending
    assert(Profiling.profileTable(df, Seq("score", "id", "lang"))
      .select("col_name").as[String].collect().toSeq ==
      Seq("id", "lang", "score"))
  }

  test("profileTable: approx knob agrees on this cardinality; bad columns loud") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"s${i % 7}"))
      .toDF("id", "s")
    val exact = Profiling.profileTable(df, Seq("s"))
      .select("n_distinct").head().getLong(0)
    val approx = Profiling.profileTable(df, Seq("s"), exact = false)
      .select("n_distinct").head().getLong(0)
    assert(exact == 7L && math.abs(approx - 7L) <= 1L)
    val e = intercept[IllegalArgumentException](
      Profiling.profileTable(df, Seq("nope")))
    assert(e.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException](
      Profiling.profileTable(df, Seq.empty))
    assert(e2.getMessage.contains("no columns"))
  }

  test("profileDiff: null-rate, distinct-ratio and range drifts flag; clean columns pass") {
    import spark.implicits._
    val a = Seq((1L, Some("en"), 5L), (2L, Some("de"), 9L),
      (3L, Some("fr"), 7L), (4L, Some("en"), 8L)).toDF("id", "lang", "n")
    // b: one quarter of lang nulled (rate 0 → 0.25), n range-capped
    val b = a.withColumn("lang",
        when(col("id") === 1L, lit(null).cast("string"))
          .otherwise(col("lang")))
      .withColumn("n", least(col("n"), lit(7L)))
    val pa = Profiling.profileTable(a, Seq("id", "lang", "n"))
    val pb = Profiling.profileTable(b, Seq("id", "lang", "n"))
    val got = Profiling.profileDiff(pa, pb).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(got("id") == (("common", false, false)))
    assert(got("lang") == (("common", false, true)))   // null-rate drift
    assert(got("n") == (("common", true, true)))       // max 9 -> 7
    // column-set changes are loud rows, not silent absences
    val pbLess = Profiling.profileTable(b.drop("n"), Seq("id", "lang"))
    val statuses = Profiling.profileDiff(pa, pbLess).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(statuses("n") == "removed")
    val added = Profiling.profileDiff(pbLess, pa).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(6))).toMap
    assert(added("n") == (("added", true)))
    // distinct-ratio gate: halving cardinality at ratio 2.0 is the
    // boundary (<0.5 drifts, 0.5 exactly passes)
    val c1 = (1 to 8).map(i => Tuple1(s"v$i")).toDF("s")
    // half the distincts, same min ("v1") and max ("v8") — the ratio
    // gate alone decides
    val c2 = Seq("v1", "v2", "v3", "v8", "v1", "v2", "v3", "v8")
      .map(Tuple1(_)).toDF("s")
    val d = Profiling.profileDiff(
      Profiling.profileTable(c1, Seq("s")),
      Profiling.profileTable(c2, Seq("s"))).head()
    assert(d.getDouble(4) == 0.5 && !d.getBoolean(6),
      s"ratio-boundary row should pass: $d")
  }
}
