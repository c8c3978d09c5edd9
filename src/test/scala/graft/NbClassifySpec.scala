package graft

import org.apache.spark.sql.functions._

import graft.operators.NbClassify

class NbClassifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val train = docs.filter(col("doc_id") % 2 === 0)
  private lazy val test_ = docs.filter(col("doc_id") % 2 === 1)

  test("nbPredict reproduces a hand-computed posterior on a toy corpus") {
    val tr = Seq(
      (0L, "spark join join", "en"),
      (1L, "join scan", "en"),
      (2L, "vin fromage", "fr"))
      .toDF("doc_id", "text", "lang")
    val te = Seq((10L, "join fromage", "xx")).toDF("doc_id", "text", "lang")
    val row = NbClassify.nbPredict(tr, te, "doc_id", "lang", col("text"))
      .collect().head
    // model by hand: V = 5 distinct train tokens
    //   (spark join scan vin fromage)
    //   en: 5 tokens -> den 10; join seen 3x -> p=4/10; fromage unseen -> 1/10
    //   fr: 2 tokens -> den 7;  join unseen -> 1/7;     fromage seen 1x -> 2/7
    def lp4(p: Double): Long = math.floor(-math.log(p) * 1e4 + 0.5).toLong
    val en = lp4(2.0 / 3) + lp4(4.0 / 10) + lp4(1.0 / 10)
    val fr = lp4(1.0 / 3) + lp4(1.0 / 7) + lp4(2.0 / 7)
    val want = if (en <= fr) ("en", en) else ("fr", fr)
    assert((row.getString(2), row.getLong(3)) == want,
      s"got (${row.getString(2)}, ${row.getLong(3)}), want $want (en=$en fr=$fr)")
    assert(!row.getBoolean(4)) // actual label "xx" is never predicted
  }

  test("nbPredict on the fixture: one row per test doc, labels from train, deterministic, self-consistent") {
    val out = NbClassify.nbPredict(train, test_, "doc_id", "lang", col("text"))
    val rows = out.collect()
    assert(rows.length == test_.count().toInt)
    val trainLabels = train.select("lang").distinct().as[String].collect().toSet
    assert(rows.map(_.getString(2)).toSet.subsetOf(trainLabels))
    rows.foreach { r =>
      assert(r.getBoolean(4) == (r.getString(1) == r.getString(2)))
    }
    // deterministic across partitionings
    val again = NbClassify.nbPredict(train.repartition(7),
        test_.repartition(5), "doc_id", "lang", col("text"))
      .collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // (the fixture's lang column is assigned independently of its
    // text, so NO classifier can beat chance on it — the learning
    // claim is pinned on a separable corpus in the next test; here
    // the fixture pins determinism and self-consistency only)
  }

  test("nbPredict learns a separable vocabulary: high accuracy on held-out class-conditional text") {
    // class-conditional vocab with a little shared noise — the signal
    // regime lang-ID actually runs in
    def doc(cls: String, i: Int): (Long, String, String) = {
      val core = cls match {
        case "en" => "the quick brown fox jumps"
        case "fr" => "le renard brun rapide saute"
        case _ => "der schnelle braune fuchs springt"
      }
      val noise = Seq("data", "x" + (i % 3))(i % 2)
      ((cls.hashCode.toLong << 8) + i, s"$core $noise", cls)
    }
    val all = for (c <- Seq("en", "fr", "de"); i <- 0 until 20) yield doc(c, i)
    val df = all.toDF("doc_id", "text", "lang")
    val tr = df.filter(col("doc_id") % 2 === 0)
    val te = df.filter(col("doc_id") % 2 === 1)
    val preds = NbClassify.nbPredict(tr, te, "doc_id", "lang", col("text"))
      .collect()
    val acc = preds.count(_.getBoolean(4)).toDouble / preds.length
    assert(acc == 1.0, f"NB accuracy $acc%.3f on a fully separable corpus")
  }

  test("nbPredict: NULL-text test rows score prior-only; NULL train labels rejected loudly") {
    val tr = Seq((0L, "a a a", "en"), (1L, "b", "fr"), (2L, "c", "fr"))
      .toDF("doc_id", "text", "lang")
    val te = Seq((10L, null.asInstanceOf[String], "en"))
      .toDF("doc_id", "text", "lang")
    val row = NbClassify.nbPredict(tr, te, "doc_id", "lang", col("text"))
      .collect().head
    // no tokens -> score is the prior alone; fr (2/3) beats en (1/3)
    def lp4(p: Double): Long = math.floor(-math.log(p) * 1e4 + 0.5).toLong
    assert(row.getString(2) == "fr" && row.getLong(3) == lp4(2.0 / 3))
    val badTrain = Seq((0L, "a", null.asInstanceOf[String]), (1L, "b", "fr"))
      .toDF("doc_id", "text", "lang")
    val e = intercept[IllegalArgumentException] {
      NbClassify.nbPredict(badTrain, te, "doc_id", "lang", col("text"))
    }
    assert(e.getMessage.contains("NULL lang"))
  }

  test("incremental model: append-then-predict is bit-identical to retraining on the union; survives compaction") {
    val model = java.nio.file.Files.createTempDirectory("nbmodel").toString + "/m"
    val a = train.filter(col("doc_id") % 4 === 0)
    val b = train.filter(col("doc_id") % 4 === 2)
    NbClassify.buildNbModel(a, "lang", col("text"), model)
    NbClassify.appendNbModel(b, "lang", col("text"), model, gen = 1L)
    def fromModel(): Seq[Seq[Any]] =
      NbClassify.nbPredictIndexed(spark, model, test_, "doc_id", "lang",
        col("text")).collect().map(_.toSeq).toSeq
    val incremental = fromModel()
    val retrained = NbClassify.nbPredict(train, test_, "doc_id", "lang",
      col("text")).collect().map(_.toSeq).toSeq
    assert(incremental == retrained,
      "incremental model diverged from retraining on the union")
    // an at-least-once replay of a generation overwrites, never
    // double-counts
    NbClassify.appendNbModel(b, "lang", col("text"), model, gen = 1L)
    assert(fromModel() == retrained, "generation replay changed the model")
    // the model generations are the streaming-sink layout — folding
    // them with the index compactor leaves every prediction identical
    // (predict re-aggregates, so a read-union-rewrite is invisible)
    assert(graft.sources.Compaction
      .compactBatches(spark, s"$model/counts", upTo = 1L).nonEmpty)
    assert(graft.sources.Compaction
      .compactBatches(spark, s"$model/classdocs", upTo = 1L).nonEmpty)
    assert(fromModel() == retrained, "compaction changed the model")
    // guards: generation 0 is the build's; NULL labels loud
    intercept[IllegalArgumentException](
      NbClassify.appendNbModel(b, "lang", col("text"), model, gen = 0L))
    val badBatch = Seq((999999L, "x", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang")
    intercept[IllegalArgumentException](
      NbClassify.appendNbModel(badBatch, "lang", col("text"), model, gen = 2L))
  }

  test("nbConfusion: cells partition the predictions and fractions sum to 1 per actual class") {
    val preds = NbClassify.nbPredict(train, test_, "doc_id", "lang", col("text"))
    val conf = NbClassify.nbConfusion(preds, "lang").collect()
    assert(conf.map(_.getLong(2)).sum == test_.count())
    conf.groupBy(_.getString(0)).foreach { case (actual, cells) =>
      val classN = cells.head.getLong(3)
      assert(cells.forall(_.getLong(3) == classN))
      assert(cells.map(_.getLong(2)).sum == classN,
        s"$actual cells do not sum to class_n")
    }
  }
}
