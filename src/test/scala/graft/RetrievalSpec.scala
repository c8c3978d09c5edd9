package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, Similarity}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrf: hand-computed fusion of two overlapping rankings") {
    // contributions: floor(1e9/61)=16393442, /62=16129032, /63=15873015
    val l1 = Seq((10L, 0.9), (20L, 0.8), (30L, 0.5)).toDF("id", "score")
    val l2 = Seq((20L, 0.95), (40L, 0.7)).toDF("id", "score")
    val got = Retrieval.rrf(Seq(l1, l2), "id", "score", k = 4)
      .as[(Long, Long, Double)].collect().toSeq
    val exp = Seq(
      (20L, 2L, (16129032L + 16393442L) / 1e9), // rank2 in l1, rank1 in l2
      (10L, 1L, 16393442L / 1e9),
      (40L, 1L, 16129032L / 1e9),
      (30L, 1L, 15873015L / 1e9))
    assert(got == exp)
  }

  test("rrf: score ties rank by id ascending") {
    val l = Seq((7L, 0.5), (3L, 0.5), (5L, 0.5)).toDF("id", "score")
    val got = Retrieval.rrf(Seq(l), "id", "score", k = 3)
      .as[(Long, Long, Double)].collect().toSeq.map(_._1)
    assert(got == Seq(3L, 5L, 7L)) // rank order = id order under ties
  }

  test("rrf: fused head can differ from every input head") {
    // 1 tops list A, 2 tops list B, but 3 is second in BOTH — two
    // rank-2 contributions (2·floor(1e9/62)) beat one rank-1
    // (floor(1e9/61)) with no second appearance
    val a = Seq((1L, 0.9), (3L, 0.8)).toDF("id", "score")
    val b = Seq((2L, 0.9), (3L, 0.8)).toDF("id", "score")
    val top = Retrieval.rrf(Seq(a, b), "id", "score", k = 1)
      .as[(Long, Long, Double)].head()
    assert(top._1 == 3L && top._2 == 2L)
  }

  test("rrf: an oversized ranking is rejected, never silently truncated") {
    // 100 rows but maxN = 2: silent truncation would erase ids 3..100's
    // tail contributions and change fused scores behind the caller's
    // back — the bounded-input contract is enforced with a targeted
    // error instead
    val big = (1 to 100).map(i => (i.toLong, 1.0 / i)).toDF("id", "score")
    val e = intercept[Exception] {
      Retrieval.rrf(Seq(big), "id", "score", k = 10, maxN = 2).collect()
    }
    assert(e.getMessage.contains("exceeds maxN=2"))
    // the same ranking fuses fine once maxN admits it
    val got = Retrieval.rrf(Seq(big), "id", "score", k = 2, maxN = 100)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got.head._3 == math.floor(1e9 / 61) / 1e9)
    // boundary: exactly maxN rows is within contract
    val ok = Retrieval.rrf(Seq(big.limit(2)), "id", "score", k = 10, maxN = 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(ok.map(_._1) == Seq(1L, 2L))
  }

  test("rrf: rejects a non-positive maxN") {
    val l = Seq((1L, 0.5)).toDF("id", "score")
    intercept[IllegalArgumentException] {
      Retrieval.rrf(Seq(l), "id", "score", k = 10, maxN = 0)
    }
  }

  test("nearestCentroidConfusion: separable clusters give a diagonal matrix") {
    val emb = Seq(
      (0L, Seq(0.1f, 0.0f), 0), (1L, Seq(0.0f, 0.2f), 0), (2L, Seq(-0.1f, 0.1f), 0),
      (3L, Seq(9.9f, 10.0f), 1), (4L, Seq(10.1f, 9.8f), 1), (5L, Seq(10.0f, 10.2f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.nearestCentroidConfusion(emb, "vec_id", "label", "embedding")
      .orderBy("true_label", "pred").as[(Int, Int, Long)].collect().toSeq
    assert(got == Seq((0, 0, 3L), (1, 1, 3L)))
  }

  test("nearestCentroidConfusion: a mislabeled point lands off-diagonal") {
    // vec 6 carries label 0 but sits in cluster 1 — with 3 honest
    // points per cluster the centroids stay near their clusters and
    // the stray is assigned to 1
    val emb = Seq(
      (0L, Seq(0.1f, 0.0f), 0), (1L, Seq(0.0f, 0.2f), 0), (2L, Seq(-0.1f, 0.1f), 0),
      (3L, Seq(9.9f, 10.0f), 1), (4L, Seq(10.1f, 9.8f), 1), (5L, Seq(10.0f, 10.2f), 1),
      (6L, Seq(10.0f, 10.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.nearestCentroidConfusion(emb, "vec_id", "label", "embedding")
      .orderBy("true_label", "pred").as[(Int, Int, Long)].collect().toSeq
    assert(got == Seq((0, 0, 3L), (0, 1, 1L), (1, 1, 3L)))
  }

  test("nearestCentroidConfusion: row count is preserved (fixture embeddings)") {
    val emb = Tables(spark, sfDir).embeddings
    val n = emb.count()
    val conf = Similarity.nearestCentroidConfusion(emb, "vec_id", "label", "embedding")
    assert(conf.agg(sum(col("n"))).as[Long].head() == n)
  }
}
