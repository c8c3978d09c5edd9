package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed+sorted tables join with no shuffle exchange") {
    val t = Tables(spark, sfDir)
    Bucketing.writeBucketed(
      t.lineitem.select("l_orderkey", "l_partkey", "l_quantity"),
      "li_bucketed", "l_orderkey", buckets = 4)
    Bucketing.writeBucketed(
      t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "ord_bucketed", "o_orderkey", buckets = 4)
    val li = Bucketing.table(spark, "li_bucketed")
    val ord = Bucketing.table(spark, "ord_bucketed")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    // force sort-merge (broadcast would hide the point at this scale)
    val joined = li.hint("merge").join(ord, Seq("l_orderkey"))
    assert(!Bucketing.hasShuffle(joined),
      s"expected shuffle-free co-located join:\n${joined.queryExecution.executedPlan}")
    // and the join is still correct
    val expected = t.lineitem
      .join(t.orders, col("o_orderkey") === col("l_orderkey")).count()
    assert(joined.count() == expected)
  }
}
