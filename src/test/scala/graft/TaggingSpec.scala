package graft

import org.apache.spark.sql.functions._

import graft.functions.AcKernel
import graft.operators.Tagging

class TaggingSpec extends SparkSpec {
  import spark.implicits._

  private def kernelCounts(text: String, pats: Seq[String]): Seq[Long] =
    AcKernel.counts(AcKernel.build(pats),
      org.apache.spark.unsafe.types.UTF8String.fromString(text)).toSeq

  /** Reference all-occurrence counter: indexOf walk advancing one
    * char past each match START (overlapping occurrences included).
    */
  private def naiveCount(text: String, p: String): Long = {
    var n = 0L
    var i = text.indexOf(p)
    while (i >= 0) { n += 1; i = text.indexOf(p, i + 1) }
    n
  }

  test("kernel: overlapping occurrences are all counted") {
    assert(kernelCounts("aaa", Seq("aa", "a", "aaa")) == Seq(2L, 3L, 1L))
    assert(kernelCounts("data data data", Seq("data", "data data")) ==
      Seq(3L, 2L))
  }

  test("kernel: output links find patterns that are suffixes of longer ones") {
    // "he" hits inside "she"; "hers" shares the "he" prefix path —
    // the classic Aho-Corasick textbook set
    assert(kernelCounts("ushers", Seq("he", "she", "hers", "his")) ==
      Seq(1L, 1L, 1L, 0L))
  }

  test("kernel: no match, empty text, pattern longer than text") {
    assert(kernelCounts("abc", Seq("zzz", "abcd")) == Seq(0L, 0L))
    assert(kernelCounts("", Seq("a")) == Seq(0L))
  }

  test("kernel: ASCII patterns never match inside multi-byte sequences") {
    // U+00E9 is 0xC3 0xA9 in UTF-8; no ASCII pattern byte can equal a
    // continuation byte, so counts agree with character semantics
    assert(kernelCounts("café a café", Seq("a", "caf")) ==
      Seq(3L, 2L))
  }

  test("kernel: duplicate patterns keep positional slots") {
    assert(kernelCounts("xx", Seq("x", "x")) == Seq(2L, 2L))
  }

  test("build rejects empty inputs") {
    intercept[IllegalArgumentException](AcKernel.build(Seq.empty))
    intercept[IllegalArgumentException](AcKernel.build(Seq("a", "")))
  }

  test("patternStats equals the naive per-pattern scan on the fixture corpus") {
    val pats = Seq("data", "data data", "spark", "the join", "zz never zz")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Tagging.patternStats(docs, "lang", col("text"), pats)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val want = docs.select(col("lang"), col("text")).as[(String, String)]
      .collect()
      .flatMap { case (lang, text) =>
        pats.map(p => (lang, p) -> naiveCount(text, p))
      }
      .filter(_._2 > 0)
      .groupBy(_._1)
      .map { case (k, v) => k -> (v.map(_._2).sum, v.length.toLong) }
    assert(got == want)
    assert(!got.keySet.exists(_._2 == "zz never zz"))
  }

  test("tagDocs drops zero rows and matches the naive counter per doc") {
    val pats = Seq("join", "data data")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val got = Tagging.tagDocs(docs, "doc_id", col("text"), pats)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect()
      .flatMap { case (id, text) =>
        pats.map(p => (id, p) -> naiveCount(text, p))
      }.filter(_._2 > 0).toMap
    assert(got == want)
  }

  test("expression evaluates identically interpreted and codegen'd") {
    val pats = Seq("a", "ab", "ba")
    val df = Seq("abab", "bb", "").toDF("t")
      .select(Tagging.patternCounts(col("t"), pats).as("c"))
    val viaCodegen = df.as[Seq[Long]].collect().toSeq
    val want = Seq("abab", "bb", "").map(t =>
      pats.map(p => naiveCount(t, p)))
    assert(viaCodegen == want)
  }

  test("sparse hits equal the dense counts' nonzero slots (scratch reuse across rows)") {
    val pats = Seq("data", "data data", "spark", "zz never zz")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dense = docs.select(col("doc_id"),
        Tagging.patternCounts(col("text"), pats).as("c"))
      .as[(Long, Seq[Long])].collect()
      .flatMap { case (id, c) =>
        c.zipWithIndex.collect { case (n, p) if n > 0 => (id, p, n) }
      }.toSet
    val sparse = docs.select(col("doc_id"),
        explode(Tagging.patternHits(col("text"), pats)).as("h"))
      .select(col("doc_id"), col("h.p"), col("h.n"))
      .as[(Long, Int, Long)].collect()
      .map { case (id, p, n) => (id, p, n) }.toSet
    assert(sparse == dense)
    // ordering canonical: struct array sorted by pattern index per row
    val orders = docs.select(Tagging.patternHits(col("text"), pats).as("h"))
      .select(col("h.p")).as[Seq[Int]].collect()
    assert(orders.forall(s => s == s.sorted))
  }

  /** Sequential reference redactor: all occurrences via indexOf,
    * sorted (start asc, len desc), greedy cursor.
    */
  private def refRedact(text: String, pats: Seq[String],
                        token: String): (String, Int) = {
    val ms = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    pats.foreach { p =>
      var i = text.indexOf(p)
      while (i >= 0) { ms += ((i, p.length)); i = text.indexOf(p, i + 1) }
    }
    val sorted = ms.sortBy { case (s, l) => (s, -l) }
    val sb = new StringBuilder
    var cur = 0; var n = 0
    sorted.foreach { case (s, l) =>
      if (s >= cur) {
        sb.append(text.substring(cur, s)).append(token); cur = s + l; n += 1
      }
    }
    sb.append(text.substring(cur))
    (sb.toString, n)
  }

  private def kernelRedact(text: String, pats: Seq[String],
                           token: String): (String, Int) = {
    val (r, n) = AcKernel.redact(AcKernel.build(pats),
      pats.map(_.getBytes("UTF-8").length).toArray,
      org.apache.spark.unsafe.types.UTF8String.fromString(text),
      org.apache.spark.unsafe.types.UTF8String.fromString(token))
    (r.toString, n)
  }

  test("redact: leftmost-longest beats a shorter match at the same start; consumed spans skip") {
    // "data data" wins at 0, consuming the "data" at 5; the "data" at
    // 10 starts after the cursor and is taken
    assert(kernelRedact("data data data", Seq("data", "data data"), "[X]") ==
      ("[X] [X]", 2))
    // a later-starting longer match loses to an earlier shorter one
    assert(kernelRedact("xabcy", Seq("ab", "bcy"), "_") == ("x_cy", 1))
    // no matches: text unchanged, zero count
    assert(kernelRedact("nothing here", Seq("zzz"), "_") == ("nothing here", 0))
    // adjacent non-overlapping matches both redact
    assert(kernelRedact("abab", Seq("ab"), ".") == ("..", 2))
    // self-overlapping pattern: greedy takes 0 and 2, not 1
    assert(kernelRedact("aaaa", Seq("aa"), "-") == ("--", 2))
    assert(kernelRedact("aaaaa", Seq("aa"), "-") == ("--a", 2))
  }

  test("redact: kernel equals the sequential reference on the fixture corpus") {
    val pats = Seq("data", "data data", "the join", "spark",
      "query query", "window scan")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Tagging.redactDocs(docs, "doc_id", col("text"), pats, "[X]")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val texts = docs.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, t) =>
      assert(got(id) == refRedact(t, pats, "[X]"),
        s"doc $id diverges from the sequential redactor")
    }
    // redacting the redacted output again is a fixpoint when the
    // token contains no dictionary text
    val again = Tagging.redactDocs(
        Tagging.redactDocs(docs, "doc_id", col("text"), pats, "[X]")
          .withColumnRenamed("redacted", "text"),
        "doc_id", col("text"), pats, "[X]")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(again.values.forall(_ == 0), "redaction is not a fixpoint")
  }

  test("redact expression evaluates identically interpreted and codegen'd") {
    val pats = Seq("aa", "b")
    val df = Seq((1L, "aaab"), (2L, "xyz")).toDF("id", "t")
    val viaCodegen = df.select(col("id"),
        Tagging.redact(col("t"), pats, "_").as("r"))
      .collect().map(r => (r.getLong(0), r.getStruct(1).getString(0),
        r.getStruct(1).getInt(1))).toSeq
    assert(viaCodegen == Seq((1L, "_a_", 2), (2L, "xyz", 0)))
  }
}
