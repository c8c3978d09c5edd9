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
}
