package graft

import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a c"),
    (2L, "b c"),
    (3L, "a a a")).toDF("doc_id", "text")

  test("build: tf and sorted positions per (term, doc)") {
    val p = InvertedIndex.build(docs, "doc_id", col("text"))
      .orderBy("term", "doc_id").as[(String, Long, Long, String)].collect()
    assert(p.toSeq == Seq(
      ("a", 1L, 2L, "0,2"), ("a", 3L, 3L, "0,1,2"),
      ("b", 1L, 1L, "1"), ("b", 2L, 1L, "0"),
      ("c", 1L, 1L, "3"), ("c", 2L, 1L, "1")))
  }

  test("dictionary: df and cf per term") {
    val p = InvertedIndex.build(docs, "doc_id", col("text"))
    val d = InvertedIndex.dictionary(p, "doc_id")
      .orderBy("term").as[(String, Long, Long)].collect()
    assert(d.toSeq == Seq(("a", 2L, 5L), ("b", 2L, 2L), ("c", 2L, 2L)))
  }

  test("index-backed search equals the raw-text scan (fixture corpus)") {
    val t = Tables(spark, sfDir)
    val corpus = t.documents.select(col("doc_id"), col("text"))
    val postings = InvertedIndex.build(corpus, "doc_id", col("text"))
    val terms = Seq("spark", "window")
    val viaIndex = InvertedIndex.searchAll(postings, "doc_id", terms)
      .orderBy("doc_id").as[Long].collect().toSeq
    val viaScan = corpus.filter(terms.map(tm =>
        array_contains(split(col("text"), " "), tm)).reduce(_ && _))
      .select(col("doc_id")).orderBy("doc_id").as[Long].collect().toSeq
    assert(viaIndex == viaScan && viaIndex.nonEmpty)
    val anyIndex = InvertedIndex.searchAny(postings, "doc_id", terms)
      .orderBy("doc_id").as[Long].collect().toSeq
    val anyScan = corpus.filter(terms.map(tm =>
        array_contains(split(col("text"), " "), tm)).reduce(_ || _))
      .select(col("doc_id")).orderBy("doc_id").as[Long].collect().toSeq
    assert(anyIndex == anyScan && anyIndex.size >= viaIndex.size)
  }

  test("searchAll with a repeated term list does not over-require") {
    val p = InvertedIndex.build(docs, "doc_id", col("text"))
    val r = InvertedIndex.searchAll(p, "doc_id", Seq("a", "a"))
      .orderBy("doc_id").as[Long].collect().toSeq
    assert(r == Seq(1L, 3L))
  }
}
