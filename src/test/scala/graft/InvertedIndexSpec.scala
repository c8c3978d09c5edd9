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

  test("appendPostings: appended index is bit-identical to a rebuild") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_postidx_spec").toString + "/idx"
    InvertedIndex.build(real.filter(col("doc_id") % 4 =!= 3),
        "doc_id", col("text"))
      .write.mode("overwrite").parquet(dir)
    InvertedIndex.appendPostings(dir,
      real.filter(col("doc_id") % 4 === 3), "doc_id", col("text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("term", "doc_id", "tf", "positions")
        .as[(String, Long, Long, String)].collect().toSet
    val appended = spark.read.parquet(dir)
    assert(rows(appended) == rows(
      InvertedIndex.build(real, "doc_id", col("text"))))
    // and therefore every derived statistic: the ranked answer matches
    val a = InvertedIndex.bm25TopKIndexed(appended, "doc_id",
      Seq("dup", "spark", "window"), k = 10).collect().toSeq
    val b = InvertedIndex.bm25TopK(real, "doc_id", col("text"),
      Seq("dup", "spark", "window"), k = 10).collect().toSeq
    assert(a == b)
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

  /** Sequential reference of bm25TopK's fixed-point arithmetic. */
  private def bm25Ref(corpus: Seq[(Long, String)], terms: Seq[String],
                      k: Int): Seq[(Long, Long, Double)] = {
    val qTerms = terms.distinct.toSet
    val toks = corpus.map { case (id, txt) => id -> txt.split(" ", -1).toSeq }
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val nd = dl.size.toLong
    val avgdl = dl.values.sum.toDouble / nd
    val tf = toks.flatMap { case (id, ts) => ts.map(t => (id, t)) }
      .groupBy(identity).map { case ((id, t), v) => (id, t) -> v.size.toLong }
    val df = qTerms.map(t => t -> tf.keys.count(_._2 == t).toLong).toMap
    val idf4 = df.map { case (t, d) =>
      t -> math.floor(math.log((nd - d + 0.5) / (d + 0.5) + 1.0) * 1e4 + 0.5).toLong
    }
    // toSeq first: collecting on the Map would collapse a doc's
    // per-term contributions onto one key
    val scores = tf.toSeq.collect { case ((id, t), f) if qTerms(t) =>
      val tfn6 = math.floor(
        f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl)) * 1e6 + 0.5).toLong
      id -> idf4(t) * tfn6
    }.groupBy(_._1).map { case (id, v) => (id, v.size.toLong, v.map(_._2).sum / 1e10) }
    scores.toSeq.sortBy { case (id, _, s) => (-s, id) }.take(k)
  }

  test("bm25TopK equals the sequential fixed-point reference (fixture corpus)") {
    val corpus = Tables(spark, sfDir).documents.select(col("doc_id"), col("text"))
    val rows = corpus.as[(Long, String)].collect().toSeq
    val terms = Seq("dup", "spark", "window")
    val got = InvertedIndex.bm25TopK(corpus, "doc_id", col("text"), terms, 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == bm25Ref(rows, terms, 10) && got.size == 10)
  }

  test("bm25 ranks the rare term above flat-df terms") {
    // doc 1 has the rare term once; doc 2 has two common-term hits;
    // same length — idf must dominate
    val c = Seq(
      (1L, "rare x y z"),
      (2L, "cc cc y z"),
      (3L, "cc a b d"), (4L, "cc e f g"), (5L, "cc h i j"),
      (6L, "cc k l m"), (7L, "cc n o p")).toDF("doc_id", "text")
    val top = InvertedIndex.bm25TopK(c, "doc_id", col("text"),
      Seq("rare", "cc"), 1).as[(Long, Long, Double)].head()
    assert(top._1 == 1L)
  }
}
