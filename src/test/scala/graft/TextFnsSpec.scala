package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("normText normalizes case, punctuation, whitespace") {
    val out = Seq("  Hello,   WORLD!! 42 ").toDF("t")
      .select(TextFns.normText(col("t"))).as[String].head()
    assert(out == "hello world 42")
  }

  test("normText is a fixpoint (canonicalization property, F5 analogue)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.select(TextFns.normText(col("text")).as("a"))
      .withColumn("b", TextFns.normText(col("a")))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("wordShingles produces n-grams; short docs give empty array") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(TextFns.wordShingles(TextFns.tokens(col("t")), 3).as("sh"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1).isEmpty)
  }

  test("subwordTokens splits letter runs, digit runs, symbols") {
    val out = Seq("abc123,x!").toDF("t")
      .select(TextFns.subwordTokens(col("t"))).as[Seq[String]].head()
    assert(out == Seq("abc", "123", ",", "x", "!"))
  }

  test("quality facets are in range and deterministic") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bad = docs.select(
      TextFns.qualityScore(col("text")).as("q"),
      TextFns.stopwordRatio(col("text")).as("sw"),
      TextFns.punctRatio(col("text")).as("p"))
      .filter(col("q") < 0 || col("q") > 1 || col("sw") < 0 || col("sw") > 1 ||
        col("p") < 0 || col("p") > 1)
    assert(bad.count() == 0)
  }

  test("langId returns a supported language and is deterministic") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val langs = docs.select(TextFns.langId(col("text")).as("l"))
      .distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "zh")))
    val a = docs.select(col("doc_id"), TextFns.langId(col("text")).as("l"))
      .orderBy("doc_id").collect().toSeq
    val b = docs.repartition(7).select(col("doc_id"), TextFns.langId(col("text")).as("l"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("fingerprint ignores case/punctuation noise") {
    val df = Seq(("Hello  World", "hello world!")).toDF("a", "b")
    val same = df.select(
      (TextFns.fingerprint(col("a")) === TextFns.fingerprint(col("b"))).as("eq"))
      .as[Boolean].head()
    assert(same)
  }
}
