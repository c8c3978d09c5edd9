package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, RangeJoin}

/** Stage attribution for the span-dedup family (q180/q181): times
  * each pipeline prefix separately so a slow end-to-end number can be
  * blamed on span build / group agg / loser join / region merge /
  * final rebuild instead of guessed at.
  */
object ProbeSpanStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val k = 8

    def consume(df: DataFrame): Long = {
      val c = df.columns.map(n => col(n).cast("string"))
      df.select(xxhash64(concat_ws("|", c: _*)).as("h"))
        .agg(expr("bit_xor(h)"), count(lit(1))).head().getLong(1)
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val spans = Dedup.spanHashes(docs, "doc_id", "text", k)
    val groups = spans.groupBy(col("h"))
      .agg(min(struct(col("id"), col("pos"))).as("keeper"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
    val losers = spans.join(groups, Seq("h"))
      .filter(struct(col("id"), col("pos")) =!= col("keeper"))
      .select(col("id"), col("pos").as("s"), (col("pos") + lit(k - 1)).as("e"))
    val regions = RangeJoin.mergeIntervals(losers, "id", "s", "e", maxGap = 1L)

    (1 to 2).foreach { rep =>
      time(s"spanHashes    r$rep")(consume(spans))
      time(s"groups        r$rep")(consume(groups))
      time(s"losers        r$rep")(consume(losers))
      time(s"regions       r$rep")(consume(regions))
      time(s"spanDedup     r$rep")(consume(
        Dedup.spanDedup(docs, "doc_id", "text", k)))
    }
  }
}
