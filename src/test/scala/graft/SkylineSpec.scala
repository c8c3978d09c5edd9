package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quality, Skyline}

/** Skyline (Pareto frontier) vs the quadratic dominance self-join it
  * replaces, and the one-pass column profiler vs per-column brute
  * aggregates.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pts = Seq(
    // (group, x, y) — minimize both
    ("g1", 1L, 9L), ("g1", 3L, 5L), ("g1", 5L, 2L),   // frontier
    ("g1", 3L, 6L),   // dominated by (3,5)
    ("g1", 5L, 5L),   // dominated by (3,5)
    ("g1", 1L, 9L),   // exact duplicate of a frontier point
    ("g1", 2L, 9L),   // dominated by (1,9): equal y, larger x
    ("g2", 7L, 7L), ("g2", 7L, 8L)  // equal-x tie: only min y survives
  ).toDF("g", "x", "y")

  private def naive(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] = {
    val p = df.select("g", "x", "y").distinct()
    p.as("q").join(p.as("d"),
        col("d.g") === col("q.g") &&
          col("d.x") <= col("q.x") && col("d.y") <= col("q.y") &&
          (col("d.x") < col("q.x") || col("d.y") < col("q.y")), "left_anti")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("skyline2d equals the NOT-EXISTS dominance scan") {
    val got = Skyline.skyline2d(pts, Seq("g"), "x", "y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("g1", 1L, 9L), ("g1", 3L, 5L), ("g1", 5L, 2L), ("g2", 7L, 7L)))
    assert(got == naive(pts))
  }

  test("skyline2d equals naive on a pseudo-random cloud") {
    val cloud = spark.range(0, 500).select(
      concat(lit("g"), pmod(col("id"), lit(3))).as("g"),
      pmod(xxhash64(col("id")), lit(50)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(50)).as("y"))
    val got = Skyline.skyline2d(cloud, Seq("g"), "x", "y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive(cloud))
    assert(got.nonEmpty)
  }

  test("skylineGlobal equals the single-group fold") {
    val cloud = spark.range(0, 500).select(
      pmod(xxhash64(col("id")), lit(60)).as("x"),
      pmod(xxhash64(col("id"), lit(2)), lit(60)).as("y"))
    val whole = Skyline.skyline2d(cloud.withColumn("g", lit("_")), Seq("g"), "x", "y")
      .select("x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Skyline.skylineGlobal(cloud, "x", "y", salts = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == whole)
  }

  test("profile: exact counts, nulls, native-type min/max") {
    val df = Seq(
      (Some(10L), Some("b")), (Some(2L), None), (None, Some("a")),
      (Some(10L), Some("c")), (Some(2L), Some("a"))
    ).toDF("num", "str")
    val rows = Quality.profile(df, Seq("num", "str"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    // native numeric min/max: "2" < "10" as numbers even though
    // string ordering would invert them
    assert(rows("num") == ((5L, 1L, 2L, "2", "10")))
    assert(rows("str") == ((5L, 1L, 3L, "a", "c")))
  }

  test("profile runs as one aggregation job (single plan, no union)") {
    val df = Seq((1L, "a")).toDF("num", "str")
    val plan = Quality.profile(df, Seq("num", "str"))
      .queryExecution.optimizedPlan.toString()
    assert(!plan.contains("Union"), s"profile planned a per-column union:\n$plan")
  }

  test("profileApprox: same shape as profile, HLL estimate exact on tiny cardinalities") {
    val df = Seq(
      (Some(10L), Some("b")), (Some(2L), None), (None, Some("a")),
      (Some(10L), Some("c")), (Some(2L), Some("a"))
    ).toDF("num", "str")
    val rows = Quality.profileApprox(df, Seq("num", "str"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    // HLL++ is exact at these cardinalities, so the approx profile
    // must equal the exact one verbatim on this fixture
    assert(rows("num") == ((5L, 1L, 2L, "2", "10")))
    assert(rows("str") == ((5L, 1L, 3L, "a", "c")))
  }

  test("profileApprox plans WITHOUT the multi-distinct Expand (one un-replicated scan)") {
    // the reason it exists: N exact countDistincts replicate the scan
    // N+1× through Catalyst's Expand; HLL sketches are plain partial
    // aggregates — no Expand anywhere in the plan
    val df = Seq((1L, "a", 2L, "b")).toDF("c1", "c2", "c3", "c4")
    val approxPlan = Quality.profileApprox(df, Seq("c1", "c2", "c3", "c4"))
      .queryExecution.executedPlan.toString()
    assert(!approxPlan.contains("Expand"),
      s"approx profile still plans Expand:\n$approxPlan")
    val exactPlan = Quality.profile(df, Seq("c1", "c2", "c3", "c4"))
      .queryExecution.executedPlan.toString()
    assert(exactPlan.contains("Expand"),
      "contrast lost: exact profile no longer plans Expand — update this test")
  }
}
