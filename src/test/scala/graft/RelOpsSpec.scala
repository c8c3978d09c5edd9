package graft

import org.apache.spark.sql.functions._

import graft.ops.RelOps._

class RelOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dupes = Seq(
    // (id, provenance, score) — duplicate ids with different payloads:
    // keep-first must pick deterministically (score desc, prov asc).
    ("a", "p1", 0.9), ("a", "p2", 0.9), ("a", "p3", 0.5),
    ("b", "p9", 0.1), ("c", "p4", 0.7), ("c", "p5", 0.8)
  ).toDF("id", "prov", "score")

  test("dedupKeepFirst picks a deterministic winner") {
    val out = dedupKeepFirst(dupes, Seq(col("id")),
      Seq(col("score").desc, col("prov").asc))
      .orderBy("id").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("a", "p1"), ("b", "p9"), ("c", "p5")))
  }

  test("dedupKeepFirst is idempotent") {
    val once = dedupKeepFirst(dupes, Seq(col("id")),
      Seq(col("score").desc, col("prov").asc))
    val twice = dedupKeepFirst(once, Seq(col("id")),
      Seq(col("score").desc, col("prov").asc))
    assert(once.orderBy("id", "prov").collect().toSeq ==
      twice.orderBy("id", "prov").collect().toSeq)
  }

  test("anti-join result is disjoint from the right side (candidate-drugs invariant)") {
    val left = Seq("a", "b", "c", "d").toDF("id")
    val right = Seq("b", "d").toDF("id")
    val diff = anti(left, right, Seq("id"))
    assert(diff.join(right, Seq("id"), "left_semi").count() == 0)
    assert(diff.as[String].collect().toSet == Set("a", "c"))
  }

  test("semi keeps only matching keys with left payload") {
    val left = Seq(("a", 1), ("b", 2)).toDF("id", "x")
    val right = Seq("b").toDF("id")
    assert(semi(left, right, Seq("id")).collect().map(_.getInt(1)).toSeq == Seq(2))
  }

  test("threshold filter keeps boundary value (>= semantics)") {
    val df = Seq(("x", 0.33), ("y", 0.329)).toDF("id", "score")
    assert(thresholdFilter(df, col("score"), 0.33).count() == 1)
  }

  test("topK is deterministic under ties") {
    val df = Seq(("a", 1.0), ("b", 1.0), ("c", 1.0)).toDF("id", "score")
    val top = topK(df, 2, Seq(col("score").desc, col("id").asc)).as[(String, Double)].collect()
    assert(top.map(_._1).toSeq == Seq("a", "b"))
  }

  test("collectPerGroup returns sorted distinct values") {
    val df = Seq(("g", "z"), ("g", "a"), ("g", "z")).toDF("k", "v")
    val out = collectPerGroup(df, Seq(col("k")), col("v"), "vs")
      .select("vs").as[Seq[String]].head()
    assert(out == Seq("a", "z"))
  }
}
