package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the co-located-join path for the joins
  * that repeat on the same key at 100 TB (fact ⋈ fact on order key,
  * doc ⋈ signature on doc id). Writing both sides bucketed+sorted on
  * the join key lets Spark plan a SortMergeJoin with NO shuffle
  * exchange on either side: the bucket layout IS the exchange,
  * amortized once at write time instead of per query.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. Drops any prior
    * table AND its leftover warehouse directory first — with an
    * in-memory catalog a stale directory from a previous session
    * isn't in the metastore, and CREATE refuses to reuse the
    * location.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** True if the executed plan of `df` contains a shuffle exchange —
    * the thing bucketing exists to eliminate.
    */
  def hasShuffle(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString()
    plan.contains("Exchange hashpartitioning") ||
      plan.contains("Exchange rangepartitioning")
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
