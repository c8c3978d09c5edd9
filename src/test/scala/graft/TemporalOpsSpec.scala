package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, RangeJoin}

/** AsofJoin and RangeJoin verify against brute-force inequality joins
  * on inline data — the naive encodings they exist to replace must
  * produce the same rows.
  */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    // (key, ts, tag)
    ("u1", 10L, "l1"), ("u1", 20L, "l2"), ("u1", 30L, "l3"),
    ("u2", 5L, "l4"), ("u3", 50L, "l5")
  ).toDF("k", "ts", "tag")

  private lazy val right = Seq(
    ("u1", 10L, "r1"), // equal-ts: must match l1 (<= semantics)
    ("u1", 25L, "r2"),
    ("u2", 9L, "r3"),  // after l4: u2 must get no match
    ("u4", 1L, "r4")   // key with no left rows
  ).toDF("k", "ts", "rtag")

  test("asofBackward equals brute-force latest-at-or-before") {
    val out = AsofJoin.asofBackward(left, right, "k", "ts", "ts", Seq("rtag", "ts"))
      .select(col("k"), col("ts"), col("asof_rtag"))
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(out == Set(
      ("u1", 10L, Some("r1")), // equal ts matches
      ("u1", 20L, Some("r1")),
      ("u1", 30L, Some("r2")),
      ("u2", 5L, None),        // right row is later
      ("u3", 50L, None)))      // no right rows for key
  }

  test("asofBackward preserves every left row exactly once") {
    val out = AsofJoin.asofBackward(left, right, "k", "ts", "ts", Seq("rtag"))
    assert(out.count() == left.count())
    assert(out.select("k", "ts").distinct().count() == left.count())
  }

  test("asofBackward plans without a join (single-shuffle union+window)") {
    val plan = AsofJoin.asofBackward(left, right, "k", "ts", "ts", Seq("rtag"))
      .queryExecution.optimizedPlan.toString()
    assert(!plan.contains("Join"), s"as-of fell back to a join:\n$plan")
  }

  test("asofForward equals brute-force earliest-at-or-after") {
    val out = AsofJoin.asofForward(left, right, "k", "ts", "ts", Seq("rtag", "ts"))
      .select(col("k"), col("ts"), col("asof_rtag"))
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(out == Set(
      ("u1", 10L, Some("r1")), // equal ts matches (>= semantics)
      ("u1", 20L, Some("r2")),
      ("u1", 30L, None),       // nothing after 30 for u1
      ("u2", 5L, Some("r3")),  // r3 at 9 is the next
      ("u3", 50L, None)))
    // brute-force cross-check: min right ts >= left ts per left row
    val brute = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.ts") >= col("l.ts"), "left")
      .groupBy(col("l.k").as("k"), col("l.ts").as("ts"))
      .agg(min(struct(col("r.ts"), col("r.rtag"))).as("m"))
      .select(col("k"), col("ts"), col("m.rtag").as("rtag"))
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(out == brute)
  }

  test("trailingWindowJoin equals the naive inequality join") {
    val anchor = Seq(("u1", 100.0, "a1"), ("u1", 205.0, "a2"), ("u2", 50.0, "a3"))
      .toDF("k", "v", "atag")
    val probe = Seq(
      ("u1", 0.0, "p0"),   // before a1's window [0,100] — boundary IN
      ("u1", 100.0, "p1"), // equals a1 — IN; inside a2's [105,205]? no
      ("u1", 105.0, "p2"), // a2 boundary — IN
      ("u1", 205.0, "p3"), // a2 upper boundary — IN
      ("u1", 206.0, "p4"), // outside everything
      ("u2", 49.0, "p5"), ("u3", 60.0, "p6"))
      .toDF("k", "v", "ptag")
    val got = RangeJoin.trailingWindowJoin(anchor, probe, "k", "v", "v",
        width = 100.0, probeCols = Seq("ptag"))
      .select(col("atag"), col("probe_ptag"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val naive = anchor.as("a").join(probe.as("p"),
        col("a.k") === col("p.k") &&
          col("p.v") >= col("a.v") - 100.0 && col("p.v") <= col("a.v"))
      .select(col("a.atag"), col("p.ptag"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == naive)
    assert(got.contains(("a1", "p0")) && got.contains(("a2", "p3")))
  }

  test("trailingWindowJoin emits no duplicate pairs at bin boundaries") {
    // anchor value an exact multiple of the width exercises the
    // two-bin explode; each (anchor, probe) pair must appear once
    val anchor = Seq(("u1", 200.0, "a1")).toDF("k", "v", "atag")
    val probe = Seq(("u1", 100.0, "p1"), ("u1", 150.0, "p2"), ("u1", 200.0, "p3"))
      .toDF("k", "v", "ptag")
    val out = RangeJoin.trailingWindowJoin(anchor, probe, "k", "v", "v",
      width = 100.0, probeCols = Seq("ptag"))
    assert(out.count() == 3)
    assert(out.select("probe_ptag").distinct().count() == 3)
  }

  private lazy val lIv = Seq(
    // (key, start, end, tag) — lengths straddle the bin width (10)
    ("u1", 0L, 10L, "a"),   // exactly one bin-width long
    ("u1", 5L, 7L, "b"),    // nested inside a
    ("u1", 10L, 35L, "c"),  // 3.5 bin-widths: wide-interval explode
    ("u2", 100L, 105L, "d"),
    ("u3", 0L, 1L, "e")     // key absent on the right
  ).toDF("k", "ls", "le", "ltag")

  private lazy val rIv = Seq(
    ("u1", 7L, 12L, "x"),   // overlaps a (touching span) AND c
    ("u1", 10L, 10L, "y"),  // point interval on a shared boundary: both
    ("u1", 36L, 40L, "z"),  // just past c — no pair
    ("u1", 20L, 22L, "w"),  // strictly inside c
    ("u2", 105L, 110L, "v"),// touches d at the endpoint — closed: IN
    ("u4", 0L, 5L, "q")     // key absent on the left
  ).toDF("k", "rs", "re", "rtag")

  test("intervalOverlapJoin equals the naive inequality join") {
    for (w <- Seq(1L, 7L, 10L, 100L)) {
      val got = RangeJoin.intervalOverlapJoin(lIv, rIv, "k",
          "ls", "le", "rs", "re", binWidth = w, rightCols = Seq("rtag"))
        .select(col("ltag"), col("r_rtag"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      val naive = lIv.as("l").join(rIv.as("r"),
          col("l.k") === col("r.k") &&
            col("l.ls") <= col("r.re") && col("r.rs") <= col("l.le"))
        .select(col("ltag"), col("rtag"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      // Seq equality after sort — duplicates at multi-bin overlaps
      // would survive a Set compare, so compare multiplicities
      assert(got.sorted == naive.sorted, s"binWidth=$w")
    }
    val got = RangeJoin.intervalOverlapJoin(lIv, rIv, "k",
        "ls", "le", "rs", "re", binWidth = 10L, rightCols = Seq("rtag"))
      .select(col("ltag"), col("r_rtag"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "x"), ("a", "y"), ("b", "x"), ("c", "x"),
      ("c", "y"), ("c", "w"), ("d", "v")))
  }

  test("intervalOverlapJoin bins exactly beyond double precision (2^60 endpoints)") {
    // at 2^60 a double's granularity is 256, so a double-binned floor
    // collapses distinct longs — the scaladoc promises exact long
    // arithmetic instead. Equality with the naive join must hold at
    // these coordinates (and at negative ones: pmod-based floor
    // division must floor, not truncate toward zero).
    val base = 1L << 60
    val lBig = Seq(("k", base, base + 10L, "L1"),
      ("k", base + 30L, base + 40L, "L2"),
      ("k", -base - 20L, -base - 10L, "L3")).toDF("k", "ls", "le", "ltag")
    val rBig = Seq(("k", base + 10L, base + 12L, "R1"), // touches L1
      ("k", base + 41L, base + 50L, "R2"),              // just past L2
      ("k", -base - 15L, -base - 12L, "R3"),            // inside L3
      ("k", base + 35L, base + 36L, "R4")).toDF("k", "rs", "re", "rtag")
    for (w <- Seq(3L, 7L, 256L)) {
      val got = RangeJoin.intervalOverlapJoin(lBig, rBig, "k",
          "ls", "le", "rs", "re", binWidth = w, rightCols = Seq("rtag"))
        .select(col("ltag"), col("r_rtag"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      val naive = lBig.as("l").join(rBig.as("r"),
          col("l.k") === col("r.k") &&
            col("l.ls") <= col("r.re") && col("r.rs") <= col("l.le"))
        .select(col("ltag"), col("rtag"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(got.sorted == naive.sorted, s"binWidth=$w")
      assert(got.toSet == Set(("L1", "R1"), ("L2", "R4"), ("L3", "R3")),
        s"binWidth=$w")
    }
  }

  test("intervalOverlapJoin rejects inverted intervals") {
    val bad = Seq(("u1", 10L, 5L, "bad")).toDF("k", "ls", "le", "ltag")
    val ex = intercept[Exception] {
      RangeJoin.intervalOverlapJoin(bad, rIv, "k",
        "ls", "le", "rs", "re", binWidth = 10L, rightCols = Seq("rtag")).collect()
    }
    assert(ex.getMessage.contains("inverted interval"))
  }

  test("mergeIntervals folds overlapping and nested runs into islands") {
    val iv = Seq(
      ("u1", 0L, 10L), ("u1", 5L, 7L),    // nested must NOT reopen
      ("u1", 10L, 12L),                   // touching endpoint: same island
      ("u1", 20L, 25L), ("u1", 24L, 30L), // chained overlap
      ("u1", 40L, 41L),
      ("u2", 0L, 1L)
    ).toDF("k", "s", "e")
    val out = RangeJoin.mergeIntervals(iv, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(
      ("u1", 0L, 12L, 3L), ("u1", 20L, 30L, 2L), ("u1", 40L, 41L, 1L),
      ("u2", 0L, 1L, 1L)))
  }

  test("mergeIntervals bridges gaps up to maxGap") {
    val iv = Seq(("u1", 0L, 10L), ("u1", 13L, 20L), ("u1", 26L, 30L))
      .toDF("k", "s", "e")
    val out = RangeJoin.mergeIntervals(iv, "k", "s", "e", maxGap = 3L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // gap 0→13 is 3 (13 <= 10+3): merged; gap 20→26 is 6: island break
    assert(out == Set((0L, 20L, 2L), (26L, 30L, 1L)))
  }
}
