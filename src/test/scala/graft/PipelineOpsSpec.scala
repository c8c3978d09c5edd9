package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Mixing, Quantize, TextMetrics}

/** Hand-computable cases + invariants for the round-3 pipeline
  * operators (repetition metrics, domain mixing, chunking, int8
  * quantization).
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ngramRepetition on a hand-computed document") {
    // "a b a b a": bigrams (a b),(b a),(a b),(b a) → 4 grams, top
    // count 2, all grams duplicated
    val docs = Seq((1L, "a b a b a"), (2L, "x y z"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextMetrics.ngramRepetition(docs, "doc_id", col("text"), n = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 2) // "solo" has no bigrams and drops out
    val d1 = out(0)
    assert(d1.getLong(0) == 1L && d1.getDouble(1) == 0.5 &&
      d1.getDouble(2) == 1.0 && d1.getLong(3) == 4L)
    val d2 = out(1) // "x y z": 2 distinct bigrams, no repetition
    assert(d2.getLong(0) == 2L && d2.getDouble(1) == 0.5 &&
      d2.getDouble(2) == 0.0 && d2.getLong(3) == 2L)
  }

  test("domainMix rates are monotone, deterministic, and exhaustive at 16") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def kept(r: Int) = Mixing.domainMix(docs, col("doc_id"), col("source"),
      rates = Map.empty, defaultSixteenths = r)
    assert(kept(16).count() == docs.count(), "rate 16 must keep everything")
    assert(kept(0).count() == 0, "rate 0 must keep nothing")
    val k4 = kept(4).select("doc_id").as[Long].collect().toSet
    val k8 = kept(8).select("doc_id").as[Long].collect().toSet
    assert(k4.subsetOf(k8), "lower rate must select a subset of higher rate")
    // deterministic across partitionings
    val k8b = Mixing.domainMix(docs.repartition(7), col("doc_id"), col("source"),
      Map.empty, 8).select("doc_id").as[Long].collect().toSet
    assert(k8 == k8b)
  }

  test("slidingChunks covers every token with the right overlap") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunking.slidingChunks(docs, "doc_id", col("text"),
        chunkSize = 4, stride = 2)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 4L, 4L, 4L, 2L))
    assert(out.head.getString(3) == "t1 t2 t3 t4")
    assert(out.last.getString(3) == "t9 t10")
  }

  test("int8 quantization error is bounded by half a scale step") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bad = emb.select(
        Quantize.int8Scale(col("embedding")).as("s"),
        Quantize.int8MeanError(col("embedding")).as("e"))
      .filter(col("e") > col("s") * 0.5 + 1e-12)
    assert(bad.count() == 0, "mean |err| must be <= scale/2")
  }

  test("int8 codes stay in [-127, 127] and zero vectors quantize to zeros") {
    val rows = Seq((1L, Array(0.1f, -0.5f, 0.25f)), (2L, Array(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = rows.select(col("vec_id"), Quantize.int8Codes(col("embedding")).as("q"))
      .orderBy("vec_id").collect()
    val q1 = out(0).getSeq[Int](1)
    assert(q1.forall(c => c >= -127 && c <= 127))
    assert(math.abs(q1(1)) == 127, "max-magnitude element maps to ±127")
    assert(out(1).getSeq[Int](1).forall(_ == 0))
  }

  test("stratifiedSample: per-stratum rates, subset monotonicity, determinism") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def ids(rates: Map[String, Int], dflt: Int) =
      Mixing.stratifiedSample(docs, col("doc_id"), col("lang"), rates, dflt)
        .select("doc_id").as[Long].collect().toSet
    assert(ids(Map.empty, 256) == docs.select("doc_id").as[Long].collect().toSet)
    assert(ids(Map.empty, 0).isEmpty)
    val half = ids(Map("en" -> 128), 256)
    val quarter = ids(Map("en" -> 64), 256)
    assert(quarter.subsetOf(half), "lower en rate selects a subset")
    // non-en strata are untouched by an en-only rate map
    val nonEn = docs.filter(col("lang") =!= "en")
      .select("doc_id").as[Long].collect().toSet
    assert(nonEn.subsetOf(half))
    // deterministic across partitionings
    val halfB = Mixing.stratifiedSample(docs.repartition(7), col("doc_id"),
        col("lang"), Map("en" -> 128), 256)
      .select("doc_id").as[Long].collect().toSet
    assert(half == halfB)
  }

  test("cdcChunks: chunks partition the doc and survive a prefix insertion") {
    import graft.operators.Chunking
    // find boundary / non-boundary words under the op's own rule
    val cands = (1 to 300).map(i => s"t$i").toDF("w")
      .select(col("w"), (conv(substring(md5(col("w")), 1, 2), 16, 10)
        .cast("int") < 32).as("b"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val bw = cands.filter(_._2).map(_._1).head
    val nb = cands.filterNot(_._2).map(_._1).take(7)
    val textA = s"${nb(0)} ${nb(1)} $bw ${nb(2)} ${nb(3)} ${nb(4)}"
    val textB = s"${nb(5)} ${nb(6)} $textA" // insertion BEFORE the boundary
    val two = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    val ch = Chunking.cdcChunks(two, "doc_id", col("text"), boundary256 = 32)
      .orderBy("id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val a = ch.filter(_._1 == 1L)
    val b = ch.filter(_._1 == 2L)
    assert(a.length == 2 && b.length == 2)
    // the chunk AFTER the boundary keeps its identity although every
    // position in doc 2 shifted by the inserted prefix
    assert(a(1)._5 == b(1)._5 && a(1)._4 == 3L)
    assert(a(0)._5 != b(0)._5, "the touched chunk re-fingerprints")
    // partition properties on the real corpus: chunks tile each doc
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val chunks = Chunking.cdcChunks(docs, "doc_id", col("text"), 32)
    val perDoc = chunks.groupBy("id")
      .agg(sum("n_words").as("nw"), min("start_pos").as("mn"),
        max(col("start_pos") + col("n_words")).as("end"),
        count(lit(1)).as("nc"))
      .join(docs.select(col("doc_id").as("id"),
        size(split(col("text"), " ")).cast("long").as("tok")), "id")
    assert(perDoc.filter(col("nw") =!= col("tok") || col("mn") =!= 1L ||
      col("end") =!= col("tok") + 1L).count() == 0)
    // geometric mean length ~256/32 = 8 words
    val mean = chunks.agg(avg("n_words")).head().getDouble(0)
    assert(mean > 5 && mean < 12, s"mean chunk length $mean off expectation")
  }

  test("weightedSample: PPS gate — unit weights keep all, zero weights none, monotone in frac") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val w = size(split(col("text"), " ")).cast("long")
    // equal weights at frac 1/1: p = n·1/n = 1 and u < 1 always
    assert(Mixing.weightedSample(docs, col("doc_id"), lit(1L), 1, 1).count()
      == docs.count())
    // zero-weight rows are never kept
    assert(Mixing.weightedSample(docs, col("doc_id"), lit(0L), 1, 1).count() == 0)
    def ids(num: Int, den: Int) =
      Mixing.weightedSample(docs, col("doc_id"), w, num, den)
        .select("doc_id").as[Long].collect().toSet
    val quarter = ids(1, 4)
    val eighth = ids(1, 8)
    // same uniforms, half the acceptance probability ⇒ strict subset chain
    assert(eighth.subsetOf(quarter))
    // expected size frac·n up to weight-capping and hash noise
    val n = docs.count()
    assert(quarter.size > n / 8 && quarter.size < n / 2,
      s"quarter sample wildly off expectation: ${quarter.size}/$n")
    // deterministic across partitionings
    val quarterB = Mixing.weightedSample(docs.repartition(7), col("doc_id"), w, 1, 4)
      .select("doc_id").as[Long].collect().toSet
    assert(quarter == quarterB)
  }

  test("weightedSamplePerGroup normalizes within each group") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val w = size(split(col("text"), " ")).cast("long")
    // unit weights at frac 1/1 keep every row of every group
    assert(Mixing.weightedSamplePerGroup(docs, col("doc_id"), col("lang"),
      lit(1L), 1, 1).count() == docs.count())
    // grouped == global when run on a single group's slice
    val en = docs.filter(col("lang") === "en")
    val g = Mixing.weightedSamplePerGroup(en, col("doc_id"), col("lang"), w, 1, 4)
      .select("doc_id").as[Long].collect().toSet
    val gl = Mixing.weightedSample(en, col("doc_id"), w, 1, 4)
      .select("doc_id").as[Long].collect().toSet
    assert(g == gl)
    // every group thins toward its own quarter, independent of the
    // corpus mixture (each within a loose hash-noise band)
    val kept = Mixing.weightedSamplePerGroup(docs, col("doc_id"), col("lang"),
        w, 1, 4)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val before = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    before.foreach { case (lang, n) =>
      val k = kept.getOrElse(lang, 0L)
      assert(k > n / 10 && k < n / 2, s"$lang kept $k of $n — off the quarter")
    }
  }

  test("temperatureMix keeps the rarest domain whole and flattens the mixture") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Mixing.temperatureMix(docs, col("doc_id"), col("lang"))
    val after = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rarest = before.minBy { case (l, n) => (n, l) }._1
    assert(after(rarest) == before(rarest),
      "rarest domain's rate is sqrt(n_min/n_min)=1 — keeps every row")
    assert(before.keys.forall(l => after.getOrElse(l, 0L) <= before(l)),
      "mix is a pure filter — nothing is duplicated")
    // the dominant/rarest imbalance must shrink (that is the point of α<1)
    val dominant = before.maxBy { case (l, n) => (n, l) }._1
    val ratioBefore = before(dominant).toDouble / before(rarest)
    val ratioAfter = after(dominant).toDouble / after(rarest)
    assert(ratioAfter < ratioBefore, s"$ratioAfter !< $ratioBefore")
    // deterministic across partitionings
    val a = kept.select("doc_id").as[Long].collect().toSet
    val b = Mixing.temperatureMix(docs.repartition(7), col("doc_id"), col("lang"))
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("epochShuffle: shards partition the corpus, dense positions, epoch-fresh order") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val e1 = Mixing.epochShuffle(docs, col("doc_id"), epoch = 1, numShards = 8)
    assert(e1.count() == docs.count(), "shuffle is a permutation, not a sample")
    val sparse = e1.groupBy("shard")
      .agg(max("pos").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(sparse == 0, "positions are dense 1..n within every shard")
    val o1 = e1.orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    val o1b = Mixing.epochShuffle(docs.repartition(5), col("doc_id"), 1, 8)
      .orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    assert(o1 == o1b, "epoch order is partitioning-independent")
    val o2 = Mixing.epochShuffle(docs, col("doc_id"), 2, 8)
      .orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    assert(o1.toSet == o2.toSet, "every epoch sees the same corpus")
    assert(o1 != o2, "epochs draw different orders")
  }

  test("capPerGroup enforces the cap and passes small groups through whole") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label")
    val capped = Mixing.capPerGroup(emb, col("vec_id"), col("label"), cap = 10)
    val over = capped.groupBy("label").count().filter(col("count") > 10).count()
    assert(over == 0, "no group exceeds the cap")
    assert(Mixing.capPerGroup(emb, col("vec_id"), col("label"), cap = 1000000)
      .count() == emb.count(), "a cap above every group size keeps everything")
    val a = capped.select("vec_id").as[Long].collect().toSet
    val b = Mixing.capPerGroup(emb.repartition(7), col("vec_id"), col("label"), 10)
      .select("vec_id").as[Long].collect().toSet
    assert(a == b, "the kept quota is deterministic across partitionings")
  }

  test("oovRate on a hand-computed corpus") {
    // counts: a=3, b=2, c=1 → vocabSize=2 keeps {a,b}; doc1's oov is
    // the lone c (1/4), doc2 is fully in-vocabulary
    val docs = Seq((1L, "a a b c"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextMetrics.oovRate(docs, "doc_id", col("text"), vocabSize = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 1L &&
      out(0).getDouble(3) == 0.25)
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 0L &&
      out(1).getDouble(3) == 0.0)
  }

  test("tfidfTop1 picks the hand-computed highest-scoring term") {
    // "rare" appears twice in doc 1 and nowhere else (df=1);
    // "common" appears in every doc (df=3 → idf ln(4/4)=0 → score 0).
    val docs = Seq(
      (1L, "common rare rare"),
      (2L, "common other"),
      (3L, "common third")).toDF("doc_id", "text")
    val out = TextMetrics.tfidfTop1(docs, "doc_id", col("text"))
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) == "rare")
    val expected = math.round(2 * math.log(4.0 / 2.0) * 1e6) / 1e6
    assert(math.abs(out(0).getDouble(2) - expected) < 1e-9)
    // docs 2/3: every candidate term ties at its score; token asc wins
    assert(out(1).getString(1) == "common" || out(1).getDouble(2) > 0.0)
  }

  test("unigramSurprisal matches the hand-computed uniform-model value") {
    // corpus "a a b" + "b": p(a)=p(b)=1/2 → every token's surprisal is
    // ln 2, quantized to 6931/1e4 → both docs average exactly 0.6931
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val out = TextMetrics.unigramSurprisal(docs, "doc_id", col("text"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 1L))
    assert(out.forall(r => math.abs(r.getDouble(2) - 0.6931) < 1e-9))
  }

  test("approxBandEdges: per-group edges are data values within the rank tolerance; pruneToBand keeps exactly the band") {
    // group g1 = 1..100, group g2 = 1001..1020: edges must come from
    // the right group (no leakage) and sit within n/accuracy of the
    // 25th/75th percentile ranks; the prune keeps (lo, hi] only
    val rows = (1 to 100).map(v => ("g1", v.toDouble)) ++
      (1001 to 1020).map(v => ("g2", v.toDouble))
    val df = rows.toDF("g", "v")
    val edges = TextMetrics.approxBandEdges(df, "g", "v", 0.25, 0.75, 10000)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val (lo1, hi1) = edges("g1")
    assert(lo1 >= 24 && lo1 <= 26 && hi1 >= 74 && hi1 <= 76,
      s"g1 edges ($lo1, $hi1) outside rank tolerance")
    val (lo2, hi2) = edges("g2")
    assert(lo2 >= 1004 && lo2 <= 1006 && hi2 >= 1014 && hi2 <= 1016,
      s"g2 edges ($lo2, $hi2) outside rank tolerance")
    val kept = TextMetrics.pruneToBand(df,
        TextMetrics.approxBandEdges(df, "g", "v", 0.25, 0.75, 10000), "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(kept.forall { case (g, v) =>
      val (lo, hi) = edges(g); v > lo && v <= hi })
    val k1 = kept.count(_._1 == "g1")
    assert(k1 >= 48 && k1 <= 52, s"g1 kept $k1 of 100")
    assert(kept.filter(_._1 == "g2").map(_._2).toSet ==
      (lo2.toInt + 1 to hi2.toInt).map(_.toDouble).toSet)
  }

  test("bigramSurprisal matches the hand-computed conditional-model value") {
    // corpus bigrams: doc1 = "a b","b a","a b"; doc2 = "a c".
    // heads: a· = 3 ("a b"×2, "a c"), b· = 1.
    // p(b|a)=2/3 → lp4=floor(ln(1.5)*1e4+0.5)=4055; p(a|b)=1 → 0;
    // p(c|a)=1/3 → lp4=floor(ln(3)*1e4+0.5)=10986.
    // doc1: (4055+0+4055)/(1e4*3) → 0.270333; doc2: 10986/1e4 → 1.0986
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x")).toDF("doc_id", "text")
    val out = TextMetrics.bigramSurprisal(docs, "doc_id", col("text"))
      .orderBy("doc_id").collect()
    // doc 3 has one token → no bigrams → dropped
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 1L))
    assert(math.abs(out(0).getDouble(2) - 0.270333) < 1e-9)
    assert(math.abs(out(1).getDouble(2) - 1.0986) < 1e-9)
  }

  test("bigramSurprisal: a rare transition of common words scores above the common order") {
    // every WORD is frequent, but doc 2's "b b" transition occurs
    // once in the corpus — the conditional model flags it where the
    // unigram model cannot
    val docs = Seq((1L, "a b a c"), (2L, "b b a c"),
      (3L, "a b a c"), (4L, "a b a c")).toDF("doc_id", "text")
    val out = TextMetrics.bigramSurprisal(docs, "doc_id", col("text"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(2L) > out(1L))
  }

  test("tokenBudgetSample: fill rule, overshoot bound, and idempotence") {
    import graft.functions.TextFns
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val kept = Mixing.tokenBudgetSample(docs, col("lang"), col("doc_id"),
      TextFns.tokenCount(col("text")), budget = 500L)
    val rows = kept.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // kept docs obey the rule: prior cumsum strictly under budget
    assert(rows.nonEmpty && rows.forall(_._4 < 500L))
    // per group: tokens spent overshoot the budget by at most one doc
    rows.groupBy(_._2).foreach { case (_, g) =>
      val spent = g.map(_._3).sum
      assert(spent - g.map(_._3).max <= 500L)
    }
    // every language with docs keeps at least one
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    assert(rows.map(_._2).toSet == langs)
    // idempotence: re-cutting the survivors with the same budget keeps all
    val again = Mixing.tokenBudgetSample(
      kept.select(col("id").as("doc_id"), col("grp").as("lang"), col("n_tok")),
      col("lang"), col("doc_id"), col("n_tok"), budget = 500L)
    assert(again.count() == rows.length)
  }

  test("matryoshka head is unit-norm and proportional to the raw prefix") {
    import graft.functions.VecFns
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    val checked = emb.select(
        VecFns.normHof(VecFns.matryoshka(col("embedding"), 16)).as("n"),
        VecFns.cosineHof(
          VecFns.matryoshka(col("embedding"), 16),
          slice(col("embedding").cast("array<double>"), 1, 16)).as("cos"))
      .collect()
    assert(checked.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
    assert(checked.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-9))
    // zero vector passes through unscaled
    val z = Seq((1L, Array(0f, 0f, 0f))).toDF("id", "v")
      .select(VecFns.l2Normalize(col("v")).as("nv")).collect()
    assert(z.head.getSeq[Double](0).forall(_ == 0.0))
  }
}
