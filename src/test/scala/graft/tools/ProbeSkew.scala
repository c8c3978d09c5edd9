package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch probe: does AQE skew-split the banded LSH self-join on a
  * boilerplate-heavy corpus once thresholds are scaled to the data?
  */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val boiler = "shared boilerplate header that dominates this corpus entirely"
    val hot = (0L until 1500L).map(i => (i, boiler))
    val rest = (10000L until 10040L).map(i => (i, s"unique document body number $i with its own words $i"))
    val skewed = (hot ++ rest).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(
      Dedup.minhashSignatures(skewed, col("doc_id"), col("text")))
    val n = cands.collect().length
    println(s"[probe] pairs=$n")
    val plan = cands.queryExecution.executedPlan.toString()
    println("[probe] skew=" + plan.contains("skew=true"))
    plan.split('\n').filter(l => l.contains("SortMergeJoin") || l.contains("AQEShuffleRead"))
      .foreach(l => println("[probe] " + l.trim.take(120)))
    spark.stop()
  }
}
