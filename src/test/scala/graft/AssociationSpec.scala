package graft

import org.apache.spark.sql.functions._

import graft.operators.{Association, Mixing}

/** Association pair mining vs the naive within-basket self-join, and
  * the deterministic split assignment's threshold layout.
  */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val baskets = Seq(
    // basket, item — b1 {x,y,z}, b2 {x,y}, b3 {x,z}, b4 {x}, b5 {y,z}
    ("b1", "x"), ("b1", "y"), ("b1", "z"),
    ("b2", "x"), ("b2", "y"), ("b2", "y"), // duplicate item row: ONE support
    ("b3", "x"), ("b3", "z"),
    ("b4", "x"),
    ("b5", "y"), ("b5", "z")
  ).toDF("b", "i")

  test("pairRules: hand-computed supports, confidence, lift") {
    val rows = Association.pairRules(baskets, "b", "i", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    // supp: x=4 y=3 z=3; pairs: xy=2, xz=2, yz=2 (all meet minSupport)
    assert(rows.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    val (sa, sb, sab, n, confAb, confBa, lift) = rows(("x", "y"))
    assert((sa, sb, sab, n) == ((4L, 3L, 2L, 5L)))
    assert(confAb == 2L * 1000000 / 4)   // 500000
    assert(confBa == 2L * 1000000 / 3)   // 666666 — floor division
    assert(lift == 2L * 5 * 1000000 / (4 * 3)) // 833333
  }

  test("pairRules equals the naive within-basket self-join") {
    val bi = baskets.select(col("b"), col("i")).distinct()
    val naive = bi.as("a").join(bi.as("c"),
        col("a.b") === col("c.b") && col("a.i") < col("c.i"))
      .groupBy(col("a.i").as("ia"), col("c.i").as("ib"))
      .agg(count(lit(1)).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = Association.pairRules(baskets, "b", "i", minSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(got == naive)
  }

  test("pairRules: minSupport prunes below-threshold pairs") {
    val out = Association.pairRules(baskets, "b", "i", minSupport = 3L)
    assert(out.count() == 0)
  }

  test("splitAssign: cumulative 256-bucket thresholds, total and deterministic") {
    val keys = spark.range(0, 2000).select(col("id"))
    val split = Mixing.splitAssign(col("id"), Seq(("train", 204), ("val", 26), ("test", 26)))
    val got = keys.select(col("id"), split.as("s"), Mixing.hexBucket256(col("id")).as("b"))
      .collect()
    got.foreach { r =>
      val want = if (r.getInt(2) < 204) "train" else if (r.getInt(2) < 230) "val" else "test"
      assert(r.getString(1) == want, s"id=${r.getLong(0)} bucket=${r.getInt(2)}")
    }
    val shares = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(shares.keySet == Set("train", "val", "test"))
    assert(shares("train") > shares("val") && shares("train") > shares("test"))
    // assignment is a pure projection: re-evaluation is identical
    val again = keys.select(split.as("s")).collect().map(_.getString(0))
    assert(again.toSeq == got.map(_.getString(1)).toSeq)
  }

  test("splitAssign rejects share layouts that do not sum to 256") {
    val ex = intercept[IllegalArgumentException] {
      Mixing.splitAssign(col("id"), Seq(("a", 100), ("b", 100)))
    }
    assert(ex.getMessage.contains("sum to 256"))
  }
}
