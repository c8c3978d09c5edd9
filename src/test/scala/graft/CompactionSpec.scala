package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.Compaction

class CompactionSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("compact: many small files -> few, content identical") {
    val t = Tables(spark, sfDir)
    val src = tmp("frag")
    t.documents.repartition(32).write.mode("overwrite").parquet(src)
    val nIn = Compaction.parquetFiles(src).size
    assert(nIn >= 16, s"fixture should be fragmented, got $nIn files")
    val out = tmp("compacted")
    val nOut = Compaction.compact(spark, src, out, targetBytes = 512L * 1024 * 1024)
    assert(nOut == 1, s"sf0.001 documents fit one target file, got $nOut")
    val a = spark.read.parquet(src).orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(out).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("clusteredWrite: partition pruning + sorted files") {
    val t = Tables(spark, sfDir)
    val out = tmp("clustered")
    Compaction.clusteredWrite(t.documents, out, "lang", "n_chars")
    val back = spark.read.parquet(out)
    // round-trip integrity
    assert(back.count() == t.documents.count())
    // a lang-filtered scan prunes to that partition's directory only
    val filtered = back.filter(col("lang") === "en")
    filtered.collect()
    val scan = (filtered.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.metrics("numFiles").value <=
      Compaction.parquetFiles(s"$out/lang=en").size,
      s"pruned scan read ${scan.metrics("numFiles").value} files; " +
        s"partition has ${Compaction.parquetFiles(s"$out/lang=en").size}")
    // rows inside each file are sorted by the cluster key
    val perFile = back.select(col("n_chars"),
        input_file_name().as("f"))
      .withColumn("prev", lag("n_chars", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f")
          .orderBy(monotonically_increasing_id())))
    // read order within a parquet file IS row order; check monotone
    val violations = perFile.filter(col("prev").isNotNull && col("prev") > col("n_chars")).count()
    assert(violations == 0, s"$violations out-of-order rows within files")
  }
}
