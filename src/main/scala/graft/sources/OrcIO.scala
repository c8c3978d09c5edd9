package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the other columnar format Spark ships natively
  * (vectorized reader, predicate pushdown, column pruning — the same
  * scan properties the parquet paths rely on), for pipelines whose
  * upstream warehouse emits ORC. Same contract as [[JsonlIO]]: write
  * is a plain overwrite, read takes an explicit schema-bearing path —
  * format conversion must be loud, never inferred-and-wrong.
  */
object OrcIO {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
