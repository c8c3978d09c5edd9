package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the S6/S7 checkpoint contract in the
  * interchange format LLM data pipelines actually exchange (one JSON
  * object per line; a corpus shard is a directory of .jsonl parts).
  * Complements `CsvIO` (the reference's own checkpoint format,
  * /root/reference/x2.2.py:361-405) with the format downstream
  * tokenizer/training jobs consume.
  *
  * Reads take an EXPLICIT schema: schema inference is a full extra
  * pass over the data (unacceptable at corpus scale) and type-guesses
  * per shard — two shards can infer different types for the same
  * column. With a schema the read is a single streaming pass and
  * malformed lines land in a `_corrupt_record` column instead of
  * failing the job (Spark's PERMISSIVE default).
  */
object JsonlIO {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
