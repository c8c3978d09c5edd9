package graft

import org.apache.spark.sql.functions._

import graft.operators.FreqSketch

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private val items = (1 to 2000).map { i =>
    // zipf-ish: token t1 dominates, long tail
    val t = if (i % 2 == 0) "t1" else if (i % 3 == 0) "t2" else s"t${i % 50}"
    Tuple1(t)
  }.toDF("token")

  test("estimates bound exact counts: exact <= est <= exact + eps*N") {
    val n = items.count()
    val eps = 0.01
    val rows = FreqSketch.estimateTopK(items, col("token"), 10, eps, 0.99, 42)
      .as[(String, Long, Long)].collect()
    assert(rows.length == 10)
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"$tok: est $est < exact $exact")
      assert(est <= exact + math.ceil(eps * n).toLong, s"$tok: est $est too high")
    }
    // the dominant token's estimate is exact-ish and ranked first
    assert(rows.head._1 == "t1")
  }

  test("sketch merge is order-independent: same estimates under repartitioning") {
    val a = FreqSketch.estimateTopK(items, col("token"), 10, 0.01, 0.99, 7)
      .collect().toSeq
    val b = FreqSketch.estimateTopK(items.repartition(13, col("token")), col("token"),
      10, 0.01, 0.99, 7).collect().toSeq
    assert(a == b)
  }
}
