package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  /** Exact trigram-Jaccard ground truth at threshold 0.8. */
  private lazy val truth = Dedup.jaccardPairs(docs, "doc_id", "text",
    n = 3, threshold = 0.8, maxShingleFreq = Long.MaxValue)
    .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("testdata contains planted near-duplicates (fixture sanity)") {
    assert(truth.nonEmpty)
  }

  test("minhash LSH finds the high-jaccard pairs (recall vs exact)") {
    val found = Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.8).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // minhash verifies candidates with EXACT jaccard, so found ⊆ truth;
    // banding (8 bands × 4 rows) at j>=0.8 should recall nearly all.
    assert(found.subsetOf(truth))
    assert(found.size >= (truth.size * 0.8).toInt,
      s"recall too low: ${found.size}/${truth.size}")
  }

  test("dedupExact keeps one row per distinct normalized text") {
    val withDups = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val out = Dedup.dedupExact(withDups, "doc_id", "text")
    assert(out.count() == docs.count())
    // min-id winner: all survivors are original ids
    assert(out.filter(col("doc_id") >= 1000000).count() == 0)
  }

  test("simhash near-dup pairs have verified hamming distance") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 8)
    val bad = pairs.filter(col("hamming") > 8 || col("id_a") >= col("id_b"))
    assert(bad.count() == 0)
  }

  test("simhash band decompositions agree: 4×16 and 8×8 hamming<=3 sets are identical") {
    // both decompositions are COMPLETE for hamming<=3 (banding
    // theorem: bands-1 >= 3 in both) and verify candidates exactly,
    // so their outputs must be the SAME set — the independent
    // cross-check the q32 envelope verdict rides on
    def pairs(bands: Int) =
      Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3, bands = bands)
        .select("id_a", "id_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs(4) == pairs(8))
  }

  test("simhash is stable across partitionings") {
    val a = Dedup.simhash64(docs, "doc_id", col("text")).orderBy("doc_id").collect().toSeq
    val b = Dedup.simhash64(docs.repartition(7), "doc_id", col("text"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("prefix-filtered jaccardPairs equals the naive all-pairs join") {
    // naive reference computed in test code over the same shingles
    import graft.functions.TextFns
    val sh = docs.limit(200).select(col("doc_id"),
      array_distinct(TextFns.wordShinglesFast(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
      .as[(Long, Seq[String])].collect()
    val naive = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= 0.5
    } yield (ia, ib)).toSet
    val fast = Dedup.jaccardPairs(docs.limit(200), "doc_id", "text",
      n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(fast == naive, s"missing=${naive -- fast} extra=${fast -- naive}")
  }

  test("jaccardPairs cluster collapse is exact on a duplicate-heavy corpus") {
    // triplicate the corpus (the crawl-duplication regime the
    // representative-collapse optimization exists for) and check
    // against the naive definition computed in test code
    import graft.functions.TextFns
    val base = docs.limit(60).select(col("doc_id"), col("text"))
    val tripled = base
      .unionByName(base.select((col("doc_id") + 1000).as("doc_id"), col("text")))
      .unionByName(base.select((col("doc_id") + 2000).as("doc_id"), col("text")))
    val sh = tripled.select(col("doc_id"),
      array_distinct(TextFns.wordShinglesFast(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
      .as[(Long, Seq[String])].collect()
    val naive = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= 0.6
    } yield (ia, ib)).toSet
    val fast = Dedup.jaccardPairs(tripled, "doc_id", "text", n = 3, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(fast == naive, s"missing=${(naive -- fast).take(5)} extra=${(fast -- naive).take(5)}")
  }

  test("positional/length filters stay exact across thresholds on adversarial docs") {
    // The candidate-time prunes (PPJoin length + positional bounds)
    // carry rounding-sensitive ceil math (plen, α): sweep thresholds —
    // including 0.9, where binary float rounding once undercounted the
    // prefix, and 1.0, the exact-duplicate boundary — over a corpus
    // built to stress them: very short docs (1-6 shingles, where an
    // off-by-one in a bound flips a pair), exact duplicates, and
    // graded near-dup chains sharing long token runs.
    import graft.functions.TextFns
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    val texts = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    // graded chains: a base sentence and rewrites dropping/replacing a
    // suffix of increasing length → Jaccard values dense near every cut
    (0 until 12).foreach { _ =>
      val base = Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      (0 to 4).foreach { k =>
        val t = (base.dropRight(k) ++ Seq.fill(k)(vocab(rnd.nextInt(vocab.size))))
          .mkString(" ")
        texts += ((id, t)); id += 1
      }
    }
    // tiny docs: 3-5 tokens = 1-3 trigram shingles
    (0 until 15).foreach { _ =>
      val t = Seq.fill(3 + rnd.nextInt(3))(vocab(rnd.nextInt(8))).mkString(" ")
      texts += ((id, t)); id += 1
    }
    // exact duplicates of a handful of docs
    texts.take(6).toVector.foreach { case (_, t) => texts += ((id, t)); id += 1 }
    val corpus = texts.toSeq.toDF("doc_id", "text")
    val sh = corpus.select(col("doc_id"),
      array_distinct(TextFns.wordShinglesFast(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
      .as[(Long, Seq[String])].collect()
    for (t <- Seq(0.3, 0.5, 0.6, 0.75, 0.9, 1.0)) {
      val naive = (for {
        (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
        inter = sa.toSet.intersect(sb.toSet).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if jr >= t
      } yield (ia, ib)).toSet
      val fast = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(fast == naive,
        s"t=$t missing=${(naive -- fast).take(5)} extra=${(fast -- naive).take(5)}")
    }
  }

  test("dupClusters resolves chains, triangles, and leaves singletons alone") {
    // components: chain 1-2-3-4, triangle 10-11-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dupClusters converges on a long chain (pointer jumping, O(log d) rounds)") {
    // 60-deep version-drift chain: one-hop propagation would need 59
    // rounds and blow the 25-round cap; pointer jumping needs ~7.
    // localSolveMaxEdges = 0 forces the DISTRIBUTED loop — this test
    // exists to exercise it.
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(chain, localSolveMaxEdges = 0L)
      .as[(Long, Long)].collect()
    assert(out.length == 60 && out.forall(_._2 == 1L))
  }

  test("dupClusters local union-find path equals the distributed loop") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.5).select("id_a", "id_b")
    val local = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    val loop = Dedup.dupClusters(pairs, localSolveMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == loop)
    assert(local.nonEmpty)
  }

  test("jaccardPairs is symmetric-free (a<b) and bounded in [0,1]") {
    val p = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
    assert(p.filter(col("id_a") >= col("id_b")).count() == 0)
    assert(p.filter(col("jaccard") < 0.5 || col("jaccard") > 1.0).count() == 0)
  }

  test("jaccardClusters equals dupClusters over the expanded pair relation") {
    // the contracted path (CC over representatives) must produce the
    // exact same (id, canonical_id) labeling as CC over member pairs,
    // including on a corpus dominated by exact-duplicate clusters
    val tripled = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 100000L))
      .unionByName(docs.withColumn("doc_id", col("doc_id") + 200000L))
    val expanded = Dedup.dupClusters(
        Dedup.jaccardPairs(tripled, "doc_id", "text", n = 3, threshold = 0.6))
      .as[(Long, Long)].collect().toMap
    val contracted = Dedup.jaccardClusters(tripled, "doc_id", "text",
        n = 3, threshold = 0.6)
      .as[(Long, Long)].collect().toMap
    assert(contracted == expanded,
      s"diff keys=${(expanded.keySet diff contracted.keySet).take(5)} / " +
        s"${(contracted.keySet diff expanded.keySet).take(5)}")
  }

  test("hot LSH bucket: AQE skew-splits the banded self-join, results stay exact") {
    // adversarial boilerplate corpus: 800 byte-identical docs land in
    // the SAME (band, bh) bucket for every band — the worst-case key
    // skew for the candidate self-join — plus planted distinct docs
    // (the C(800,2) floors below must track this count)
    val boiler = "shared boilerplate header that dominates this corpus entirely"
    val hot = (0L until 800L).map(i => (i, boiler))
    val rest = (10000L until 10040L).map(i => (i, s"unique document body number $i with its own words $i"))
    val skewed = (hot ++ rest).toDF("doc_id", "text")
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // scale AQE's skew thresholds down to fixture size (at 100 TB
      // the defaults engage on the same shape) and force the
      // sort-merge path a real corpus would take
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val cands = Dedup.minhashCandidates(
        Dedup.minhashSignatures(skewed, col("doc_id"), col("text")))
      // execute THIS DataFrame (count() would plan a separate query
      // and leave cands' own adaptive plan unfinalized)
      val n = cands.collect().length.toLong
      // exact under skew: all C(800,2) boilerplate pairs survive
      assert(n >= 799L * 800L / 2,
        s"hot-bucket candidate pairs missing: $n")
      // the executed (final adaptive) plan must show the skew split —
      // max-task input is bounded by the advisory size, not the
      // hot bucket's full m rows
      val plan = cands.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE did not skew-split the banded join:\n$plan")
      // the simhash path defends against the same corpus DIFFERENTLY:
      // identical hashes contract to one representative BEFORE the
      // band join (round 8 — the uncontracted join was quadratic in
      // clone-cluster size at 100×), so the hot bucket never reaches
      // the join at all and no skew split is needed. The output must
      // still be the exact pair set, clone pairs at hamming 0.
      val sim = Dedup.simhashNearDups(skewed, "doc_id", "text")
      val ns = sim.collect().count(_.getInt(2) == 0).toLong
      assert(ns >= 799L * 800L / 2, s"simhash hot-bucket pairs missing: $ns")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("ensureClusterLabels builds once, rereads after, and matches a fresh computation") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_jacclabels_spec").toString + "/labels"
    val fresh = Dedup.jaccardClusters(docs, "doc_id", "text",
        n = 3, threshold = 0.6)
      .as[(Long, Long)].collect().toMap
    val built = Dedup.ensureClusterLabels(docs, "doc_id", "text",
        n = 3, threshold = 0.6, Long.MaxValue, path)
      .as[(Long, Long)].collect().toMap
    assert(built == fresh)
    // second call serves the artifact without rebuilding: the _SUCCESS
    // marker under the PARAMETER-KEYED directory (the path ensure
    // actually publishes) must be untouched (same mtime) after the
    // call. (Pre-round-8 this probed the unkeyed path, whose missing
    // marker made the mtime check vacuous.)
    val success = new java.io.File(
      s"$path-n3-t600000-f${Long.MaxValue}", "_SUCCESS")
    assert(success.isFile, "keyed artifact directory missing its marker")
    val mtime = success.lastModified()
    val reread = Dedup.ensureClusterLabels(docs, "doc_id", "text",
        n = 3, threshold = 0.6, Long.MaxValue, path)
      .as[(Long, Long)].collect().toMap
    assert(reread == fresh)
    assert(success.lastModified() == mtime, "artifact was rebuilt on reread")
  }

  test("minhash contraction equals the uncontracted pipeline on a clone-heavy corpus") {
    // 3 exact copies of every doc: the regime where the uncontracted
    // banded self-join is quadratic in cluster size. The reference is
    // the pre-contraction pipeline reconstructed from the public
    // pieces: signatures → banded candidates → exact verification.
    val docs3 = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      .unionByName(docs.select((col("doc_id") + 2000000).as("doc_id"), col("text")))
    val sh = Dedup.hashedShingleSets(docs3, "doc_id", "text", 3)
      .persist()
    val sigs = Dedup.minhashSignatures(docs3, col("doc_id"), col("text"), 32, 3)
    val cands = Dedup.minhashCandidates(sigs, 32, 8)
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val uni = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    val reference = cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", round(when(uni > 0, inter / uni).otherwise(lit(0.0)), 6))
      .filter(col("jaccard") >= 0.6)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val contracted = Dedup.minhashNearDups(docs3, "doc_id", "text", 0.6)
      .as[(Long, Long, Double)].collect().toSet
    assert(contracted == reference)
    assert(contracted.nonEmpty)
    sh.unpersist()
  }

  test("simhash contraction equals the uncontracted band join on a clone-heavy corpus") {
    val docs3 = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    // uncontracted reference: band every row, self-join, verify
    val sh = Dedup.simhash64(docs3, "doc_id", col("text"))
    val banded = sh.select(col("doc_id").as("id"), col("simhash"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bh"))
        }: _*)).as("b"))
      .select(col("id"), col("simhash"), col("b.band"), col("b.bh"))
    val reference = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .as[(Long, Long, Int)].collect().toSet
    val contracted = Dedup.simhashNearDups(docs3, "doc_id", "text", maxHamming = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(contracted == reference)
    assert(contracted.nonEmpty)
  }

  test("dupClustersIncremental equals from-scratch components over the union") {
    val all = Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.6, maxShingleFreq = Long.MaxValue)
    val archPairs = all.filter(col("id_a") % 4 =!= 3 && col("id_b") % 4 =!= 3)
    val batchPairs = all.filter(col("id_a") % 4 === 3 || col("id_b") % 4 === 3)
    val old = Dedup.dupClusters(archPairs)
    def labelSet(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    val inc = labelSet(Dedup.dupClustersIncremental(batchPairs, old))
    val full = labelSet(Dedup.dupClusters(all))
    assert(inc == full)
    assert(inc.nonEmpty, "fixture should plant cross-split components")
    // the batch must actually MERGE something, or the test is vacuous
    assert(inc != labelSet(old), "batch pairs should change the label table")
    // no-op fold: an empty batch reproduces the archive labels exactly
    assert(labelSet(Dedup.dupClustersIncremental(batchPairs.limit(0), old))
      == labelSet(old))
  }

  test("jaccardJoin equals the self-join restricted to cross pairs") {
    val leftSide = docs.filter(col("doc_id") % 4 === 3)
    val rightSide = docs.filter(col("doc_id") % 4 =!= 3)
    val got = Dedup.jaccardJoin(leftSide, rightSide, "doc_id", "text",
        n = 3, threshold = 0.6)
      .as[(Long, Long, Double)].collect().toSet
    // jaccardPairs is itself pinned against the naive all-pairs join,
    // so its cross-pair slice (re-oriented left-first) is the exact
    // reference — including clone-cluster expansions on both sides
    val expect = Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.6, maxShingleFreq = Long.MaxValue)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 4 == 3) != (b % 4 == 3) }
      .map { case (a, b, j) => if (a % 4 == 3) (a, b, j) else (b, a, j) }
      .toSet
    assert(got == expect)
    assert(got.nonEmpty, "fixture should plant cross-side near-dups")
  }

  test("incremental minhash equals the full run restricted to batch-touching pairs") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_incmh_spec").toString
    val shAll = Dedup.ensureShingleSets(docs, "doc_id", "text", n = 3, s"$dir/sh")
    val shHist = shAll.filter(col("id") % 4 =!= 3)
    val batch = docs.filter(col("doc_id") % 4 === 3)
    val archBands = Dedup.minhashBands(
      Dedup.minhashSignaturesFromShingles(shHist, k = 32, shingleN = 3))
    val inc = Dedup.minhashNearDupsIncremental(batch, "doc_id", "text",
      archiveShingles = shHist, archiveBands = archBands, threshold = 0.6,
      batchShingles = Some(shAll.filter(col("id") % 4 === 3)))
    // vs classification matches the id split on every row
    assert(inc.filter((col("vs") === "batch") =!=
      (col("id_a") % 4 === 3 && col("id_b") % 4 === 3)).count() == 0)
    val incSet = inc.select(least(col("id_a"), col("id_b")),
        greatest(col("id_a"), col("id_b")), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    // same banding, same exact verification ⇒ the incremental shape
    // (archive never re-banded or self-joined) must reproduce the
    // full-corpus run's batch-touching slice exactly, jaccards included
    val full = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.6)
      .filter(col("id_a") % 4 === 3 || col("id_b") % 4 === 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(incSet == full)
    assert(incSet.nonEmpty, "fixture should plant batch-touching near-dups")
    // parameter provenance: an archive banded under different (k,
    // bands) is rejected, as is a relation with no metadata at all
    val wrongBands = Dedup.minhashBands(
      Dedup.minhashSignaturesFromShingles(shHist, k = 16, shingleN = 3),
      k = 16, bands = 8)
    intercept[IllegalArgumentException] {
      Dedup.minhashNearDupsIncremental(batch, "doc_id", "text",
        archiveShingles = shHist, archiveBands = wrongBands)
    }
    val bare = archBands.select(col("id"), col("band"),
      (col("bh") + lit(0L)).as("bh"))
    intercept[IllegalArgumentException] {
      Dedup.minhashNearDupsIncremental(batch, "doc_id", "text",
        archiveShingles = shHist, archiveBands = bare)
    }
  }

  test("contaminationFuzzy flags verbatim embedding by containment, not jaccard") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta"),
      // long doc embedding the whole benchmark item: containment 1.0
      // even though jaccard is tiny — the case q65-style absolute
      // counts and jaccard thresholds both mis-handle
      (1L, "zero one two three four five alpha beta gamma delta six seven eight nine ten"),
      // half the benchmark's trigrams: containment exactly 0.5
      (2L, "alpha beta gamma nine"),
      (3L, "completely different words here entirely")
    ).toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") === 0)
    val got = Dedup.contaminationFuzzy(corpus, bench, "doc_id", "text",
        n = 3, minContainment = 0.5)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    // bench trigrams {abc, bcd}: doc1 shares both (n_doc=13 trigrams,
    // j=2/13), doc2 shares one (n_doc=2, j=1/3), doc3 none, self pair
    // excluded
    assert(got == Set(
      (1L, 0L, 2L, 0.153846, 1.0),
      (2L, 0L, 1L, 0.333333, 0.5)))
    // width-mismatched pre-built shingles are rejected like the other
    // consumers of the shingle contract
    val sh4 = Dedup.ensureShingleSets(corpus, "doc_id", "text", n = 4,
      java.nio.file.Files.createTempDirectory("graft_fuzzy_spec").toString + "/sh")
    intercept[IllegalArgumentException] {
      Dedup.contaminationFuzzy(corpus, bench, "doc_id", "text",
        n = 3, docShingles = Some(sh4))
    }
  }

  test("pre-built shingle relations with mismatched or missing width are rejected") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shingles_spec").toString
    val sh4 = Dedup.ensureShingleSets(docs, "doc_id", "text", n = 4, s"$dir/sh")
    // width mismatch: built with n=4, consumed at n=3 — must throw
    // (pre-contract this silently changed every Jaccard value)
    val mismatch = intercept[IllegalArgumentException] {
      Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, shingles = Some(sh4))
    }
    assert(mismatch.getMessage.contains("n=4"))
    intercept[IllegalArgumentException] {
      Dedup.contamination(docs, docs.limit(5), "doc_id", "text",
        n = 3, docShingles = Some(sh4))
    }
    intercept[IllegalArgumentException] {
      Dedup.ensureClusterLabels(docs, "doc_id", "text",
        n = 3, threshold = 0.8, Long.MaxValue, s"$dir/labels",
        shingles = Some(sh4))
    }
    // provenance-less relation (right shape, no metadata) — rejected
    val bare = docs.select(col("doc_id").as("id"),
      array(xxhash64(col("text"))).as("sh"))
    val noMeta = intercept[IllegalArgumentException] {
      Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, shingles = Some(bare))
    }
    assert(noMeta.getMessage.contains("metadata"))
    // the happy path: a matching relation is accepted and reproduces
    // the internally-shingled result exactly
    val sh3 = Dedup.ensureShingleSets(docs, "doc_id", "text", n = 3, s"$dir/sh")
    val viaArtifact = Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, shingles = Some(sh3))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaArtifact == truth)
  }

  test("a stale or mislabeled parameter sidecar forces an artifact rebuild") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shingles_meta_spec").toString
    Dedup.ensureShingleSets(docs, "doc_id", "text", n = 3, s"$dir/sh")
    val sidecar = new java.io.File(s"$dir/sh-n3", "_graft_meta.json")
    assert(sidecar.isFile, "artifact should carry a parameter sidecar")
    // simulate a pre-sidecar or mislabeled generation: wrong width in
    // the sidecar must read as INCOMPLETE and trigger a rebuild
    java.nio.file.Files.write(sidecar.toPath,
      """{"kind": "shingle-sets", "n": "7"}""".getBytes("UTF-8"))
    val again = Dedup.ensureShingleSets(docs, "doc_id", "text", n = 3, s"$dir/sh")
    assert(graft.operators.Artifact.metaMatches(s"$dir/sh-n3",
      Map("kind" -> "shingle-sets", "n" -> "3")),
      "rebuild should restore a matching sidecar")
    assert(again.count() > 0)
  }

  test("dedupIncremental drops archived content and keeps batch-first") {
    val history = Seq((2L, "already seen text")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "already seen text"),   // in archive → dropped
      (3L, "fresh text"),          // kept
      (5L, "fresh text"),          // batch-dup of 3 → dropped
      (7L, "another fresh one")    // kept
    ).toDF("doc_id", "text")
    val seen = history
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"))
    val out = Dedup.dedupIncremental(batch, seen, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(3L, 7L))
  }

  // ---------------- duplicated-span removal ----------------

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("spanDedup hand case: keep-first, cross-doc + within-doc, adjacent regions merge") {
    val corpus = Seq(
      (1L, "a b c d e f g h x1 x2"),                       // keeper of the shared 8-gram
      (2L, "y1 y2 a b c d e f g h y3"),                    // loses [3,10]
      (3L, "z1 a b c d e f g h a b c d e f g h"),          // loses [2,9]+[10,17] → one region
      (4L, "too short for any span")                       // 5 words < k
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(corpus, "doc_id", "text", k = 8)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(out(0) == ((1L, 10L, 0L, 0L, 0L, md5Hex("a b c d e f g h x1 x2"))))
    assert(out(1) == ((2L, 11L, 1L, 8L, 8000000L / 11L, md5Hex("y1 y2 y3"))))
    assert(out(2) == ((3L, 17L, 1L, 16L, 16000000L / 17L, md5Hex("z1"))))
    assert(out(3) == ((4L, 5L, 0L, 0L, 0L, md5Hex("too short for any span"))))
  }

  test("spanDedup equals a sequential reference on the real corpus") {
    val k = 6
    val raw = docs.select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    // sequential reference: group occurrences by span CONTENT,
    // keep-first by (doc, pos), merge contiguous removals per doc
    val occ = raw.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      (0 to ws.length - k).map(i => (ws.slice(i, i + k).mkString(" "), id, i + 1L))
    }
    val losers = occ.groupBy(_._1).values.filter(_.length > 1).toSeq
      .flatMap(g => g.map(o => (o._2, o._3)).sorted.drop(1))
    val expected = raw.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val ivs = losers.filter(_._1 == id).map(o => (o._2, o._2 + k - 1)).sorted
      val merged = ivs.foldLeft(List.empty[(Long, Long)]) {
        case (acc @ ((s0, e0) :: rest), (s, e)) =>
          if (s <= e0 + 1) (s0, math.max(e0, e)) :: rest else (s, e) :: acc
        case (Nil, iv) => iv :: Nil
      }.reverse
      val removed = merged.map { case (s, e) => e - s + 1 }.sum
      val kept = ws.zipWithIndex.collect {
        case (w, i) if !merged.exists(iv => i + 1 >= iv._1 && i + 1 <= iv._2) => w
      }
      (id, ws.length.toLong, merged.size.toLong, removed,
        if (ws.isEmpty) 0L else removed * 1000000L / ws.length,
        md5Hex(kept.mkString(" ")))
    }
    val got = Dedup.spanDedup(docs, "doc_id", "text", k = k).orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"doc ${e._1}") }
    assert(got.count(_._3 > 0) > 0, "fixture should contain duplicated spans")
  }

  test("spanDedupIncremental: archived spans removed outright, fresh spans keep-first") {
    val batch = Seq(
      (10L, "a b c d e f g h x1 x2"),   // 8-gram is in the archive → removed
      (11L, "n1 n2 n3 n4 n5 n6 n7 n8"), // fresh, unique in batch → kept
      (12L, "n1 n2 n3 n4 n5 n6 n7 n8 t")// fresh dup of 11's gram → loses [1,8]
    ).toDF("doc_id", "text")
    val history = Seq((1L, "zz a b c d e f g h")).toDF("doc_id", "text")
    val out = Dedup.spanDedupIncremental(batch,
        Dedup.spanArchive(history, "doc_id", "text", k = 8),
        "doc_id", "text", k = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(5)))
    assert(out(0) == ((10L, 1L, 8L, md5Hex("x1 x2"))))
    assert(out(1) == ((11L, 0L, 0L, md5Hex("n1 n2 n3 n4 n5 n6 n7 n8"))))
    assert(out(2) == ((12L, 1L, 8L, md5Hex("t"))))
  }

  test("spanDedupIncremental equals the full-corpus run when history precedes the batch") {
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val history = docs.filter(col("doc_id") < cut)
    val batch = docs.filter(col("doc_id") >= cut)
    val inc = Dedup.spanDedupIncremental(batch,
        Dedup.spanArchive(history, "doc_id", "text", k = 6),
        "doc_id", "text", k = 6)
      .orderBy("id").collect().toSeq
    val full = Dedup.spanDedup(docs, "doc_id", "text", k = 6)
      .filter(col("id") >= cut).orderBy("id").collect().toSeq
    assert(inc == full)
    assert(inc.exists(_.getLong(2) > 0), "batch should lose some spans")
  }

  test("spanDedupIncremental with an empty archive degenerates to spanDedup") {
    val empty = Seq.empty[String].toDF("h")
    val inc = Dedup.spanDedupIncremental(docs, empty, "doc_id", "text", k = 8)
      .orderBy("id").collect().toSeq
    val plain = Dedup.spanDedup(docs, "doc_id", "text", k = 8)
      .orderBy("id").collect().toSeq
    assert(inc == plain)
  }

  test("wordSpanMd5 kernel is bit-identical to the declarative HOF form") {
    val edge = Seq(
      (100L, "plain words one two three four five six seven eight"),
      (101L, "double  space keeps the  empty word in every position x y"),
      (102L, " leading and trailing spaces "),
      (103L, "exactly eight words fill one single whole span"),
      (104L, "seven words not quite one span here"),
      (105L, "")
    ).toDF("doc_id", "text")
    for (src <- Seq(edge, docs.select(col("doc_id"), col("text"))); k <- Seq(2, 8)) {
      val a = Dedup.spanHashes(src, "doc_id", "text", k)
        .orderBy("id", "pos").collect().toSeq
      val b = Dedup.spanHashesHof(src, "doc_id", "text", k)
        .orderBy("id", "pos").collect().toSeq
      assert(a == b, s"kernel diverges from HOF at k=$k")
    }
  }

  test("spanDedup is stable across partitionings") {
    val a = Dedup.spanDedup(docs, "doc_id", "text", k = 8)
      .orderBy("id").collect().toSeq
    val b = Dedup.spanDedup(docs.repartition(7), "doc_id", "text", k = 8)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("nearDupLookup: probe results equal the self-join's probe-touching pairs; caps and parameters loud") {
    val probes = docs.filter(col("doc_id") % 10 === 0)
    val sh = Dedup.hashedShingleSets(docs, "doc_id", "text", 3)
    val archBands = Dedup.minhashBands(
      Dedup.minhashSignaturesFromShingles(sh, k = 32, shingleN = 3))
    val got = Dedup.nearDupLookup(probes, "doc_id", "text", sh, archBands,
        threshold = 0.6, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: the batch self-join restricted to probe-touching
    // pairs, both orientations (a probe can be either end), own-id
    // pairs excluded by construction (id_a < id_b in the self-join)
    val pids = probes.select("doc_id").as[Long].collect().toSet
    val self = Dedup.minhashNearDups(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = self.collect {
        case (a, b, j) if pids(a) => (a, b, j)
      }.toSet ++ self.collect { case (a, b, j) if pids(b) => (b, a, j) }.toSet
    assert(got == want, s"lookup ${got.size} pairs != self-join-derived ${want.size}")
    // a probe never reports its own archived row
    assert(got.forall { case (p, d, _) => p != d })
    // the probe cap is loud
    val e = intercept[IllegalArgumentException] {
      Dedup.nearDupLookup(docs, "doc_id", "text", sh, archBands,
        threshold = 0.6, shingleN = 3, maxProbes = 3)
    }
    assert(e.getMessage.contains("bounded probe batches"))
    // mismatched band parameters are rejected by provenance metadata
    intercept[IllegalArgumentException] {
      Dedup.nearDupLookup(probes, "doc_id", "text", sh, archBands,
        threshold = 0.6, k = 16, bands = 4, shingleN = 3)
    }
  }
}
