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

  test("jaroWinkler matches the textbook values and DuckDB edge semantics") {
    import graft.functions.JaroWinklerKernel.compute
    assert(math.abs(compute("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(compute("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(compute("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-15)
    assert(compute("abc", "abc") == 1.0)
    // DuckDB convention: ANY empty side (including both) scores 0
    assert(compute("", "") == 0.0 && compute("a", "") == 0.0 && compute("", "a") == 0.0)
    // match window ⌊2/2⌋-1 = 0: adjacent transposition finds no match
    assert(compute("ab", "ba") == 0.0)
    // boost fires only above 0.7: CRATE/TRACE jaro ≈ 0.733 with a
    // 0-length common prefix stays un-boosted
    assert(math.abs(compute("CRATE", "TRACE") - 0.7333333333333334) < 1e-15)
  }

  test("jaroWinkler column (codegen path) equals the kernel and is symmetric") {
    // covers both kernel paths: ASCII ≤64 bytes (bitmask fast path) vs
    // multibyte / >64-byte inputs (general char-wise fallback) — the
    // column evaluates the fast path where eligible, `compute` is
    // always the general path, and they must agree
    val pairs = Seq(
      ("MARTHA", "MARHTA"), ("Supplier#000000001", "Supplier#000000010"),
      ("Customer#000000123", "Supplier#000000321"), ("", "x"), ("same", "same"),
      ("naïve approach", "naive approach"),
      ("x" * 70 + "abc", "x" * 70 + "acb"),
      ("ab" * 33, "ba" * 33))
    val df = pairs.toDF("a", "b")
    val viaCol = df.select(
      TextFns.jaroWinkler(col("a"), col("b")).as("ab"),
      TextFns.jaroWinkler(col("b"), col("a")).as("ba"))
      .as[(Double, Double)].collect().toSeq
    pairs.zip(viaCol).foreach { case ((a, b), (ab, ba)) =>
      assert(ab == graft.functions.JaroWinklerKernel.compute(a, b))
      assert(ab == ba) // Jaro and the prefix boost are both symmetric
    }
    // null in, null out (BinaryExpression null contract)
    val withNull = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(TextFns.jaroWinkler(col("a"), col("b")).as("j"))
    assert(withNull.filter(col("j").isNull).count() == 1)
  }
}
