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
}
