package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Compaction

/** Maintenance-path probes for the two round-13 watch items:
  *
  *  1. `compact`: the streaming `batch=<id>` layout's read cost as
  *     generations accumulate, before vs after
  *     [[Compaction.compactBatches]] — the evidence that the fold is
  *     worth running (small-file read amplification) AND that it is
  *     safe (the consumer-facing relation is BIT-IDENTICAL across the
  *     fold, asserted on a full-content fingerprint).
  *
  *  2. `drift`: recall degradation under frozen-centroid IVF appends
  *     — the number [[Similarity.ivfDriftReport]]'s `drifted` flag
  *     exists to predict. A drifted batch (one dimension shifted, the
  *     q213 device) is appended at increasing multiples of the build
  *     corpus; at each step we measure top-10 recall of the appended
  *     index vs (a) exact brute force over the union and (b) a
  *     REBUILT index over the same union with the same nlist/nprobe —
  *     isolating the frozen-centroid penalty from the inherent IVF
  *     pruning loss — and record whether the drift report flags the
  *     index at that step.
  *
  * SPARK_GRAFT_PROBE_SECTIONS=compact,drift restricts sections.
  */
object ProbeMaintain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = "/root/testdata/sf0.1"
    val sections = sys.env.get("SPARK_GRAFT_PROBE_SECTIONS")
      .map(_.split(',').toSet)
    def section(name: String): Boolean = sections.forall(_.contains(name))

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
      r
    }

    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(); ()
    }

    // ---------------- 1. batch= compaction read cost ----------------
    if (section("compact")) {
      val nBatches = sys.env.getOrElse("SPARK_GRAFT_COMPACT_BATCHES", "256").toInt
      val dir = s"/tmp/graft_probe_compact_$nBatches"
      deleteRec(new java.io.File(dir))
      // one postings-shaped relation (the q195 sink layout: data files
      // carry no batch column; the generation id is directory-encoded),
      // landed as nBatches trigger generations — 10x the sf0.1 docs so
      // per-batch row counts are production-shaped small, not empty
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val rel = (0 until 10).map(i => docs.select(
          (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text"), col("lang")))
        .reduce(_ unionByName _)
        .withColumn("__b", pmod(xxhash64(col("doc_id")), lit(nBatches.toLong)))
        .cache()
      val total = rel.count()
      time(s"land $nBatches batch= generations") {
        (0 until nBatches).foreach { b =>
          rel.filter(col("__b") === b.toLong).drop("__b")
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$dir/batch=$b")
        }
      }
      rel.unpersist()
      def fingerprint(): (Long, Long) = {
        val r = spark.read.parquet(dir)
          .agg(count(lit(1)).as("n"),
            sum(pmod(xxhash64(col("doc_id"), col("text"), col("lang")),
              lit(1000000007L))).as("h"))
          .head()
        (r.getLong(0), r.getLong(1))
      }
      def files(): Int = Compaction.parquetFiles(dir).size
      def serveCost(label: String): (Long, Long) = {
        // a consumer-shaped read: full-relation agg (the archive
        // anti-join / index-scan class reads everything once)
        time(s"read  $label (warm 1)")(fingerprint())
        time(s"read  $label (warm 2)")(fingerprint())
        time(s"read  $label (timed)")(fingerprint())
      }
      println(s"[probe] files before fold: ${files()}  rows=$total")
      val before = serveCost(s"$nBatches gens")
      val folded = time(s"compactBatches upTo=${nBatches - 1}")(
        Compaction.compactBatches(spark, dir, upTo = nBatches - 1L))
      require(folded.nonEmpty, "compactBatches folded nothing")
      println(s"[probe] files after fold: ${files()}")
      val after = serveCost("1 base gen")
      require(before == after,
        s"fold changed the consumer-facing relation: $before vs $after")
      println(s"[probe] invariant: content fingerprint identical across " +
        s"the fold (n=${after._1}) — TRUE")
    }

    // ---------------- 2. IVF frozen-centroid drift recall ----------------
    if (section("drift")) {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val nBase = emb.count()
      val nlist = 16
      val nprobe = 4
      val k = 10
      // drifted ingest: dimension 0 shifted far outside the build
      // distribution (the q213 device) — the new mode crowds into
      // whichever frozen centroid happens to be least wrong
      def drifted(mult: Int): DataFrame =
        (1 to mult).map(m => emb.select(
            (col("vec_id") + lit(m * 1000000L)).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i === 0, x + lit(8.0f)).otherwise(x))
              .as("embedding")))
          .reduce(_ unionByName _)
      // query set: 16 base-mode + 16 drifted-mode ids, fixed
      val qIds = (0L until 16L).map(_ * 100L) ++
        (0L until 16L).map(1000000L + _ * 100L)

      def exactTop(union: DataFrame, qid: Long): Set[Long] = {
        val qv = union.filter(col("vec_id") === qid)
          .select("embedding").head().getSeq[Float](0).toArray
        union.filter(col("vec_id") =!= qid)
          .select(col("vec_id"),
            round(graft.functions.VecFns.cosine(col("embedding"),
              typedlit(qv)), 6).as("c"))
          .orderBy(col("c").desc, col("vec_id").asc).limit(k)
          .select("vec_id").as[Long].collect().toSet
      }
      def ivfTop(idx: String, union: DataFrame, qid: Long): Set[Long] = {
        val qv = union.filter(col("vec_id") === qid)
          .select("embedding").head().getSeq[Float](0).toArray
        Similarity.ivfTopKIndexed(spark, idx, "vec_id", "embedding", qv, k,
            nprobe, excludeId = qid)
          .select("vec_id").as[Long].collect().toSet
      }

      Seq(1, 3).foreach { mult =>
        val appended = s"/tmp/graft_probe_drift_app_$mult"
        val rebuilt = s"/tmp/graft_probe_drift_reb_$mult"
        Seq(appended, rebuilt).foreach(p => deleteRec(new java.io.File(p)))
        val dft = drifted(mult).cache()
        val union = emb.unionByName(dft).cache()
        union.count()
        time(s"build+append (drift x$mult)") {
          Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist, appended)
          Similarity.appendIvfIndex(spark, appended, dft, "vec_id", "embedding")
        }
        time(s"rebuild over union (x$mult)")(
          Similarity.buildIvfIndex(union, "vec_id", "embedding", nlist, rebuilt))
        val report = Similarity.ivfDriftReport(spark, appended, "embedding")
          .select(col("drifted")).as[Boolean].collect()
        val exact = qIds.map(q => q -> exactTop(union, q)).toMap
        def recall(idx: String): Double = {
          val hits = qIds.map(q => (ivfTop(idx, union, q) & exact(q)).size).sum
          hits.toDouble / (qIds.size * k)
        }
        val rApp = time(s"recall appended (x$mult)")(recall(appended))
        val rReb = time(s"recall rebuilt  (x$mult)")(recall(rebuilt))
        println(f"[probe] drift x$mult: appended=${nBase * mult} " +
          f"recall_appended=$rApp%.3f recall_rebuilt=$rReb%.3f " +
          s"drift_flagged=${report.count(identity)}/${report.length}")
        require(report.exists(identity),
          s"drift x$mult: ivfDriftReport flagged nothing under a shifted mode")
        dft.unpersist(); union.unpersist()
      }
      // control: appends drawn from the SAME distribution must not
      // flag and must not lose recall vs a rebuild
      val sameApp = "/tmp/graft_probe_drift_same"
      deleteRec(new java.io.File(sameApp))
      val same = emb.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        col("embedding"))
      val union = emb.unionByName(same).cache(); union.count()
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist, sameApp)
      Similarity.appendIvfIndex(spark, sameApp, same, "vec_id", "embedding")
      val flags = Similarity.ivfDriftReport(spark, sameApp, "embedding")
        .select(col("drifted")).as[Boolean].collect()
      println(s"[probe] control (same-distribution x1 append): " +
        s"drift_flagged=${flags.count(identity)}/${flags.length}")
      require(!flags.exists(identity),
        "same-distribution append tripped the drift report")
      union.unpersist()
    }

    // ---------------- 3. partial IVF list rebuild ----------------
    // What rebuildIvfLists actually buys on the drift fixture,
    // measured honestly. The headline of the r14 drift section
    // (recall 0.753 appended vs 0.788 rebuilt) DECOMPOSES: drift-mode
    // queries have recall ~1.0 on BOTH indexes (the drift dimension
    // dominates the centroid ranking, so drifted queries always probe
    // the receiving lists) — the gap is BASE-mode quantizer variance
    // between two one-Lloyd-step centroid sets, not drift damage. The
    // rebuild's measurable wins are (a) the drift report coming back
    // clean against a re-baselined sidecar and (b) OCCUPANCY: the
    // receiving mega-lists (30x average) make every probe that ranks
    // them scan 4-30x a normal list's rows — `splitTo` restores
    // average occupancy at the caller-owned nprobe/nlist trade. Serve
    // cost is reported as ROWS SCANNED per query (deterministic; the
    // wall-second deltas at this corpus scale are probe fixed-cost
    // noise). Recall is reported PER MODE so a base-luck delta can
    // never masquerade as drift recovery again.
    if (section("rebuild")) {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val nlist = 16
      val nprobe = 4
      val k = 10
      val mult = 3
      val appended = "/tmp/graft_probe_rebuild_app"
      val appended2 = "/tmp/graft_probe_rebuild_app2"
      val rebuilt = "/tmp/graft_probe_rebuild_full"
      Seq(appended, appended2, rebuilt)
        .foreach(p => deleteRec(new java.io.File(p)))
      val dft = (1 to mult).map(m => emb.select(
          (col("vec_id") + lit(m * 1000000L)).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + lit(8.0f)).otherwise(x))
            .as("embedding")))
        .reduce(_ unionByName _).cache()
      val union = emb.unionByName(dft).cache(); union.count()
      time("build+append (rebuild fixture)") {
        Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist, appended)
        Similarity.appendIvfIndex(spark, appended, dft, "vec_id", "embedding")
      }
      // second copy of the appended state for the splitTo variant
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(appended), new java.io.File(appended2))
      time("full rebuild over union")(
        Similarity.buildIvfIndex(union, "vec_id", "embedding", nlist, rebuilt))
      val qIds = (0L until 16L).map(_ * 100L) ++
        (0L until 16L).map(1000000L + _ * 100L)
      def exactTop(qid: Long): Set[Long] = {
        val qv = union.filter(col("vec_id") === qid)
          .select("embedding").head().getSeq[Float](0).toArray
        union.filter(col("vec_id") =!= qid)
          .select(col("vec_id"),
            round(graft.functions.VecFns.cosine(col("embedding"),
              typedlit(qv)), 6).as("c"))
          .orderBy(col("c").desc, col("vec_id").asc).limit(k)
          .select("vec_id").as[Long].collect().toSet
      }
      val exact = qIds.map(q => q -> exactTop(q)).toMap
      def cosL(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        val den = math.sqrt(na) * math.sqrt(nb)
        if (den == 0) 0 else d / den
      }
      // per-mode recall + avg rows scanned (probed list sizes)
      def probeIdx(idx: String): (Double, Double, Double) = {
        val sizes = spark.read.parquet(s"$idx/vectors")
          .groupBy(col("__cid")).count()
          .as[(Int, Long)].collect().toMap
        val cents = spark.read.parquet(s"$idx/centroids")
          .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
          .sortBy(_._1)
        var hb = 0L; var hd = 0L; var scanned = 0L
        qIds.foreach { qid =>
          val qv = union.filter(col("vec_id") === qid)
            .select("embedding").head().getSeq[Float](0).toArray
          val probes = cents.sortBy { case (c, v) => (-cosL(v, qv), c) }
            .take(nprobe).map(_._1)
          scanned += probes.map(sizes.getOrElse(_, 0L)).sum
          val hits = (Similarity.ivfTopKIndexed(spark, idx, "vec_id",
              "embedding", qv, k, nprobe, excludeId = qid)
            .select("vec_id").as[Long].collect().toSet & exact(qid)).size
          if (qid < 1000000L) hb += hits else hd += hits
        }
        (hb.toDouble / (16 * k), hd.toDouble / (16 * k),
          scanned.toDouble / qIds.size)
      }
      def report(label: String, idx: String): (Double, Double, Double) = {
        val (rb, rd, rows) = time(s"probe $label")(probeIdx(idx))
        val top = spark.read.parquet(s"$idx/vectors")
          .groupBy(col("__cid")).count().orderBy(col("count").desc)
          .select("count").as[Long].take(3)
        println(f"[probe]   $label%-28s recall base=$rb%.3f " +
          f"drift=$rd%.3f rows/query=$rows%.0f top-lists=${top.mkString("/")}")
        (rb, rd, rows)
      }
      val (preB, preD, preRows) = report("appended (pre-rebuild)", appended)
      val flagged = Similarity.ivfDriftReport(spark, appended, "embedding")
        .filter(col("drifted")).select(col("cid").cast("int"))
        .as[Int].collect().toSeq.sorted
      require(flagged.nonEmpty, "rebuild probe: nothing flagged")
      time(s"rebuildIvfLists in-place (${flagged.size}/$nlist)")(
        Similarity.rebuildIvfLists(spark, appended, "vec_id", "embedding",
          flagged))
      val (postB, postD, postRows) = report("in-place rebuild", appended)
      // splitTo: restore average occupancy for the outgrown mass
      val avgSize = (union.count() / nlist).toInt
      val flaggedRows = spark.read.parquet(s"$appended2/vectors")
        .filter(col("__cid").isin(flagged: _*)).count()
      val slots = math.max(flagged.size, (flaggedRows / avgSize).toInt)
      time(s"rebuildIvfLists splitTo=$slots")(
        Similarity.rebuildIvfLists(spark, appended2, "vec_id", "embedding",
          flagged, splitTo = Some(slots)))
      val (splB, splD, splRows) = report(s"splitTo=$slots rebuild", appended2)
      val (fulB, fulD, fulRows) = report("full rebuild", rebuilt)
      println(f"[probe] rebuild summary (drift x$mult, ${flagged.size}/$nlist " +
        f"flagged): drift recall pre=$preD%.3f inplace=$postD%.3f " +
        f"split=$splD%.3f full=$fulD%.3f (base-mode ceilings vary with " +
        f"quantizer luck: $preB%.3f/$postB%.3f/$splB%.3f/$fulB%.3f); " +
        f"rows/query pre=$preRows%.0f inplace=$postRows%.0f " +
        f"split=$splRows%.0f full=$fulRows%.0f")
      // the drift mode itself must never lose recall through a rebuild
      require(postD >= preD - 0.05,
        f"in-place rebuild lost drift recall: $preD%.3f -> $postD%.3f")
      require(splD >= preD - 0.05,
        f"splitTo rebuild lost drift recall: $preD%.3f -> $splD%.3f")
      require(Similarity.ivfDriftReport(spark, appended, "embedding")
        .filter(col("drifted")).count() == 0,
        "post-rebuild drift report still flags lists")
      // Finding (r15, kept as the probe's record): on THIS fixture the
      // drift mass is a single tight cluster of near-identical
      // directions — cosine k-means cannot partition it, so splitTo
      // leaves one mega-slot and rows/query barely moves
      // (pre~3971 / split~3602 measured). A tight drifted mode's scan
      // cost is IRREDUCIBLE at the IVF layer (its members genuinely
      // are the answer set — pruning them would cost the 1.0 drift
      // recall); the per-row remedy is the quantized tier
      // (IVF×SQ8 reads 1/4 the bytes of the same mega list). splitTo
      // earns its keep only when the drifted mass has internal
      // structure for the quantizer to separate.
      if (splRows >= preRows * 0.7)
        println(f"[probe] note: splitTo left rows/query ~flat " +
          f"($preRows%.0f -> $splRows%.0f) — tight-cluster fixture, " +
          "see the finding comment")
      dft.unpersist(); union.unpersist()
    }

    // ---------------- 4. composed-tier partial rebuild ----------------
    // rebuildIvfSq8Lists on a drift fixture the FROZEN-scales clip
    // guard admits: a sign-flip of dim 0 (same magnitudes, so codes
    // stay in range) forms a second mode that crowds existing lists.
    // Measured: recall at fixed nprobe vs the FULL-PROBE code ranking
    // (the unpruned SQ8-metric truth), per mode, pre-rebuild vs
    // partial rebuild vs full rebuild; untouched list dirs
    // byte-identical.
    if (section("sq8rebuild")) {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val nlist = 16
      val nprobe = 4
      val k = 10
      val appended = "/tmp/graft_probe_sq8reb_app"
      val rebuilt = "/tmp/graft_probe_sq8reb_full"
      Seq(appended, rebuilt).foreach(p => deleteRec(new java.io.File(p)))
      val dft = emb.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, -x).otherwise(x)).as("embedding")).cache()
      val union = emb.unionByName(dft).cache(); union.count()
      time("build+append (sq8 rebuild fixture)") {
        Similarity.buildIvfSq8Index(emb, "vec_id", "embedding", nlist, appended)
        Similarity.appendIvfSq8Index(spark, appended, dft,
          "vec_id", "embedding")
      }
      time("full composed rebuild over union")(
        Similarity.buildIvfSq8Index(union, "vec_id", "embedding",
          nlist, rebuilt))
      val qIds = (0L until 16L).map(_ * 100L) ++
        (0L until 16L).map(1000000L + _ * 100L)
      def qvOf(qid: Long): Array[Float] = union
        .filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Float](0).toArray
      // truth per index = its own FULL-PROBE code ranking (pruning is
      // the thing under test; quantization is held fixed)
      def probeIdx(idx: String): (Double, Double, Double) = {
        val nl = spark.read.parquet(s"$idx/centroids").count().toInt
        val sizes = spark.read.parquet(s"$idx/codes")
          .groupBy(col("__cid")).count().as[(Int, Long)].collect().toMap
        val cents = spark.read.parquet(s"$idx/centroids")
          .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
        var hb = 0L; var hd = 0L; var scanned = 0L
        qIds.foreach { qid =>
          val qv = qvOf(qid)
          def cosL(a: Array[Float], b: Array[Float]): Double = {
            var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < a.length) {
              d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
            val den = math.sqrt(na) * math.sqrt(nb)
            if (den == 0) 0 else d / den
          }
          val probes = cents.sortBy { case (c, v) => (-cosL(v, qv), c) }
            .take(nprobe).map(_._1)
          scanned += probes.map(sizes.getOrElse(_, 0L)).sum
          val full = Similarity.ivfSq8TopK(spark, idx, "vec_id", qv, k,
            nprobe = nl, excludeId = qid)
            .select("vec_id").as[Long].collect().toSet
          val pruned = Similarity.ivfSq8TopK(spark, idx, "vec_id", qv, k,
            nprobe = nprobe, excludeId = qid)
            .select("vec_id").as[Long].collect().toSet
          val hits = (pruned & full).size
          if (qid < 1000000L) hb += hits else hd += hits
        }
        (hb.toDouble / (16 * k), hd.toDouble / (16 * k),
          scanned.toDouble / qIds.size)
      }
      def dirSig(p: String): Map[String, Long] =
        Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> (f.length() ^ f.lastModified())).toMap
      val (preB, preD, preRows) =
        time("probe appended (pre-rebuild)")(probeIdx(appended))
      // flag the lists the appended mode outgrew: occupancy > 4x the
      // pre-append count (the ivfDriftReport occupancy criterion,
      // computed from the two count relations)
      val baseCounts = {
        val tmp = "/tmp/graft_probe_sq8reb_basecount"
        deleteRec(new java.io.File(tmp))
        Similarity.buildIvfSq8Index(emb, "vec_id", "embedding", nlist, tmp)
        spark.read.parquet(s"$tmp/codes").groupBy(col("__cid")).count()
          .as[(Int, Long)].collect().toMap
      }
      val nowCounts = spark.read.parquet(s"$appended/codes")
        .groupBy(col("__cid")).count().as[(Int, Long)].collect().toMap
      // the flip mode spreads across lists (unlike the shift fixture's
      // tight cluster) — flag the two lists it crowded MOST
      val flagged = nowCounts.toSeq
        .map { case (c, n) => c -> (n - baseCounts.getOrElse(c, 0L)) }
        .sortBy { case (c, g) => (-g, c) }.take(2).map(_._1).sorted
      require(flagged.nonEmpty, "sq8rebuild probe: no growth to flag")
      val untouched = (nowCounts.keySet -- flagged.toSet).map { c =>
        c -> dirSig(s"$appended/codes/__cid=$c")
      }.toMap
      time(s"rebuildIvfSq8Lists (${flagged.size}/$nlist, splitTo x2)")(
        Similarity.rebuildIvfSq8Lists(spark, appended, "vec_id", flagged,
          splitTo = Some(math.min(Similarity.RebuildSlotCap,
            flagged.size * 2))))
      untouched.foreach { case (c, sig) =>
        require(dirSig(s"$appended/codes/__cid=$c") == sig,
          s"sq8 rebuild touched unflagged list $c") }
      val (postB, postD, postRows) =
        time("probe partial rebuild")(probeIdx(appended))
      val (fulB, fulD, fulRows) =
        time("probe full rebuild")(probeIdx(rebuilt))
      println(f"[probe] sq8rebuild summary (${flagged.size}/$nlist flagged): " +
        f"recall base pre=$preB%.3f post=$postB%.3f full=$fulB%.3f | " +
        f"flip-mode pre=$preD%.3f post=$postD%.3f full=$fulD%.3f | " +
        f"rows/query pre=$preRows%.0f post=$postRows%.0f full=$fulRows%.0f")
      require(postD >= preD - 0.05,
        f"partial sq8 rebuild lost flip-mode recall: $preD%.3f -> $postD%.3f")
      require(postB >= preB - 0.05,
        f"partial sq8 rebuild lost base recall: $preB%.3f -> $postB%.3f")
      dft.unpersist(); union.unpersist()
    }

    // ---------------- 5. partial PQ subspace rebuild ----------------
    // rebuildPqSubspaces vs a full buildPqIndex over the union, on
    // the dim-0-shift fixture (subspace 0 flags). Measured: wall cost
    // of the partial vs full path, ADC-candidate recall vs the exact
    // L2 top-10 per mode (base / shifted queries) pre-rebuild vs
    // partial vs full, and the sub-0 quantization-error (resid_e6)
    // trajectory. Unflagged code values are asserted invariant.
    if (section("pqrebuild")) {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val k = 10
      val idx = "/tmp/graft_probe_pqreb_idx"
      val full = "/tmp/graft_probe_pqreb_full"
      Seq(idx, full).foreach(p => deleteRec(new java.io.File(p)))
      val shifted = emb.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(8.0f)).otherwise(x))
          .as("embedding")).cache()
      val grown = emb.unionByName(shifted).cache(); grown.count()
      time("build+append (pq rebuild fixture)") {
        Similarity.buildPqIndex(emb, "vec_id", "embedding",
          numSub = 8, k = 16, idx)
        Similarity.appendPqIndex(spark, idx, shifted, "vec_id", "embedding")
      }
      val flagged = Similarity.pqDriftReport(spark, idx, grown, "embedding")
        .filter(col("drifted")).select(col("sub").cast("int"))
        .as[Int].collect().toSeq.sorted
      require(flagged.nonEmpty, "pqrebuild probe: nothing flagged")
      val residPre = Similarity.pqDriftReport(spark, idx, grown, "embedding")
        .filter(col("sub") === 0).select(col("resid_now_e6")).as[Long].head()
      val qIds = (0L until 16L).map(_ * 100L) ++
        (0L until 16L).map(1000000L + _ * 100L)
      def qvOf(qid: Long): Array[Float] = grown
        .filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Float](0).toArray
      def exactTop(qid: Long): Set[Long] = {
        val qv = qvOf(qid)
        grown.filter(col("vec_id") =!= qid)
          .select(col("vec_id"),
            (graft.functions.VecFns.dot(col("embedding"), col("embedding"))
              - lit(2.0) * graft.functions.VecFns.dot(col("embedding"),
                typedlit(qv))).as("d"))
          .orderBy(col("d").asc, col("vec_id").asc).limit(k)
          .select("vec_id").as[Long].collect().toSet
      }
      val exact = qIds.map(q => q -> exactTop(q)).toMap
      // ADC-candidate recall at rerank = k: how well the CODE ranking
      // alone finds the true top-k (the exact re-rank hides codebook
      // damage at larger rerank budgets — this is the honest signal)
      def recall(path: String): (Double, Double) = {
        var hb = 0L; var hd = 0L
        qIds.foreach { qid =>
          val got = Similarity.pqTopK(spark, path, grown, "vec_id",
              "embedding", qvOf(qid), k, rerank = k, excludeId = qid)
            .select("vec_id").as[Long].collect().toSet
          val hits = (got & exact(qid)).size
          if (qid < 1000000L) hb += hits else hd += hits
        }
        (hb.toDouble / (16 * k), hd.toDouble / (16 * k))
      }
      val (preB, preD) = time("probe appended (pre-rebuild)")(recall(idx))
      def tailSum(path: String): Long = spark.read.parquet(s"$path/codes")
        .agg(sum(pmod(xxhash64(col("vec_id"),
          to_json(slice(col("codes"), 2, 7))), lit(1000000007L))))
        .head().getLong(0)
      val tailPre = tailSum(idx)
      time(s"rebuildPqSubspaces (${flagged.size}/8 subspaces)")(
        Similarity.rebuildPqSubspaces(spark, idx, grown, "vec_id",
          "embedding", flagged))
      require(tailSum(idx) == tailPre,
        "pq rebuild moved unflagged code values")
      val residPost = spark.read.parquet(s"$idx/stats")
        .filter(col("sub") === 0).select(col("resid_build_e6"))
        .as[Long].head()
      val (postB, postD) = time("probe partial rebuild")(recall(idx))
      time("full rebuild over union")(
        Similarity.buildPqIndex(grown, "vec_id", "embedding",
          numSub = 8, k = 16, full))
      val residFull = spark.read.parquet(s"$full/stats")
        .filter(col("sub") === 0).select(col("resid_build_e6"))
        .as[Long].head()
      val (fulB, fulD) = time("probe full rebuild")(recall(full))
      println(f"[probe] pqrebuild summary (${flagged.size}/8 flagged): " +
        f"adc-recall base pre=$preB%.3f post=$postB%.3f full=$fulB%.3f | " +
        f"shift-mode pre=$preD%.3f post=$postD%.3f full=$fulD%.3f | " +
        f"sub0 resid_e6 pre=$residPre post=$residPost full=$residFull")
      require(Similarity.pqDriftReport(spark, idx, grown, "embedding")
        .filter(col("drifted")).count() == 0,
        "post-rebuild pq drift report still flags subspaces")
      require(residPost < residPre,
        s"partial rebuild did not reduce sub-0 resid: $residPre -> $residPost")
      require(postD >= preD - 0.05,
        f"partial pq rebuild lost shift-mode recall: $preD%.3f -> $postD%.3f")
      require(postB >= preB - 0.05,
        f"partial pq rebuild lost base recall: $preB%.3f -> $postB%.3f")
      shifted.unpersist(); grown.unpersist()
    }

    spark.stop()
  }
}
