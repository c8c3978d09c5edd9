package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dumps the fixture-learned unigram-LM vocab (the q172 pin source)
  * and the EM cost trace. Not part of the library API.
  */
object ProbeUnigram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (df, trace) = graft.operators.UnigramLm.learnVocabWithTrace(
      docs, col("text"), vocabSize = 80, maxPieceLen = 4, iters = 3)
    println("TRACE=" + trace.mkString(","))
    val rows = df.orderBy(col("n_uses").desc, col("piece")).collect()
    println("NROWS=" + rows.length)
    rows.foreach { r =>
      val tag = if (r.getString(0).length > 1) "MULTI" else "SINGLE"
      println(s"$tag\t${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}")
    }
    spark.stop()
  }
}
