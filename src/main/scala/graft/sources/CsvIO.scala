package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink (SURVEY.md §2.1 S6/S7): the reference checkpoints
  * every pipeline step to CSV (/root/reference/x2.2.py:361-405) and
  * reloads with `load_from_files=True`. Headers on, no pandas index
  * column — which is exactly the artifact the reference has to strip
  * back out (/root/reference/x2.2.py:310-312); writing headers-only
  * makes that fixup op (P9) vanish.
  */
object CsvIO {

  def read(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema match {
      case Some(sc) => r.schema(sc).csv(path)
      case None     => r.option("inferSchema", "true").csv(path)
    }
  }

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S6's second output: the distinct-id set derived at load
    * (/root/reference/x2.2.py:229-235 returns `(records, id_set)`).
    */
  def readWithIdSet(spark: SparkSession, path: String, idCol: String,
                    schema: Option[StructType] = None): (DataFrame, DataFrame) = {
    val df = read(spark, path, schema)
    (df, df.select(idCol).distinct())
  }
}
