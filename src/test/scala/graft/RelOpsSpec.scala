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

  test("saltedJoin returns exactly the plain join result") {
    val left = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val right = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = left.join(right, Seq("l_partkey")).groupBy("p_brand")
      .agg(sum("l_quantity").as("q")).orderBy("p_brand").collect().toSeq
    val salted = saltedJoin(left, right, "l_partkey", salt = 8).groupBy("p_brand")
      .agg(sum("l_quantity").as("q")).orderBy("p_brand").collect().toSeq
    assert(plain == salted)
  }

  test("SQL registration exposes the native kernels to spark.sql") {
    graft.functions.Register.all(spark)
    val row = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
         dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
         hyperplane_sig(array(1.0D, 2.0D)) AS s""").head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getDouble(1) == 11.0)
    // deterministic signature: same value as the Column API
    import spark.implicits._
    val viaCol = Seq(Tuple1(Array(1.0, 2.0))).toDF("v")
      .select(graft.functions.VecFns.hyperplaneSig(col("v"))).head().getLong(0)
    assert(row.getLong(2) == viaCol)
  }

  test("collectPerGroup returns sorted distinct values") {
    val df = Seq(("g", "z"), ("g", "a"), ("g", "z")).toDF("k", "v")
    val out = collectPerGroup(df, Seq(col("k")), col("v"), "vs")
      .select("vs").as[Seq[String]].head()
    assert(out == Seq("a", "z"))
  }

  test("joinSkewReport ranks keys by join-output volume, zeroes one-sided keys") {
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val r = Seq(1L, 1L, 2L, 4L).toDF("k")
    val out = joinSkewReport(l, r, "k", topN = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 2L, 6L),   // the hot key leads
      (2L, 1L, 1L, 1L),
      (3L, 1L, 0L, 0L),   // right-absent → 0 output rows
      (4L, 0L, 1L, 0L)))  // left-absent
    // n_out is exactly the inner-join row count per key
    val joined = l.join(r, Seq("k")).groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    out.filter(_._4 > 0).foreach { case (k, _, _, n) => assert(joined(k) == n) }
  }
}
