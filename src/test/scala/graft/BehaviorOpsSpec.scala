package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Bloom, EditJoin, Funnel, Resample}

/** Hand-computable cases + invariants for the behavioral-analytics,
  * resampling, and Bloom-prefilter operators.
  */
class BehaviorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // user 1: view@10 → click@20 → purchase@30 (full funnel)
  // user 2: click@5 before their view@10, re-click never → stops at view
  // user 3: view@10, purchase@20 but no click → stops at view
  // user 4: no view at all → not counted anywhere
  private lazy val funnelEvents = Seq(
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    (2L, 5L, "click"), (2L, 10L, "view"),
    (3L, 10L, "view"), (3L, 20L, "purchase"),
    (4L, 10L, "click"), (4L, 20L, "purchase"))
    .map { case (u, t, e) => (u, ts(t), e) }.toDF("u", "t", "e")

  test("funnelStages: ordered completion, hand-computed") {
    val out = Funnel.funnelStages(funnelEvents, col("u"), col("t"), col("e"),
      Seq("view", "click", "purchase")).collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("funnelStages: same-timestamp later stage counts (>= semantics)") {
    val df = Seq((1L, ts(10), "view"), (1L, ts(10), "click")).toDF("u", "t", "e")
    val out = Funnel.funnelStages(df, col("u"), col("t"), col("e"),
      Seq("view", "click")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }

  test("funnelStagesWithin: a too-late stage falls outside the deadline") {
    // user 1 clicks 50 s after view; user 2 clicks 200 s after view
    val df = Seq(
      (1L, ts(0), "view"), (1L, ts(50), "click"),
      (2L, ts(0), "view"), (2L, ts(200), "click")).toDF("u", "t", "e")
    val within = Funnel.funnelStagesWithin(df, col("u"), col("t"), col("e"),
      Seq("view", "click"), maxGapSec = Some(100L)).collect()
    assert(within.map(_.getLong(2)).toSeq == Seq(2L, 1L))
    val unbounded = Funnel.funnelStages(df, col("u"), col("t"), col("e"),
      Seq("view", "click")).collect()
    assert(unbounded.map(_.getLong(2)).toSeq == Seq(2L, 2L))
  }

  test("sessionize: boundary gap stays in-session, strictly-greater splits") {
    // user 1: events at 0, 1800 (gap == 1800 s, SAME session),
    //         then 3601 (gap 1801 s > 1800 → new session)
    // user 2: one event → one singleton session
    val df = Seq(
      (1L, 10L, ts(0)), (1L, 11L, ts(1800)), (1L, 12L, ts(3601)),
      (2L, 20L, ts(5)))
      .toDF("u", "id", "t")
    val out = Funnel.sessionize(df, col("u"), col("t"), col("id"), gapSec = 1800L)
      .orderBy("user", "session_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 0L, 1800L * 1000000L),
      (1L, 2L, 1L, 3601L * 1000000L, 3601L * 1000000L),
      (2L, 1L, 1L, 5L * 1000000L, 5L * 1000000L)))
  }

  test("sessionize matches a sequential reference on adversarial random gaps") {
    // 200 users, gaps drawn to cluster AT the boundary (gap−1µs, gap,
    // gap+1µs) — the µs-exactness claim is only tested by inputs that
    // straddle it. The reference is an independent sequential fold.
    val gapSec = 100L
    val gapUs = gapSec * 1000000L
    val rnd = new scala.util.Random(20260814L)
    val rows = (1L to 200L).flatMap { u =>
      var t = 1000000L + rnd.nextInt(1000000)
      (1 to rnd.nextInt(25) + 1).map { i =>
        t += (rnd.nextInt(5) match {
          case 0 => gapUs - 1
          case 1 => gapUs
          case 2 => gapUs + 1
          case 3 => rnd.nextInt(1000).toLong
          case _ => gapUs * 3
        })
        (u, u * 1000 + i, t)
      }
    }
    val df = rows.toDF("u", "id", "us")
      .withColumn("t", timestamp_micros(col("us")))
    val got = Funnel.sessionize(df, col("u"), col("t"), col("id"), gapSec)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sorted.toSeq
    val want = rows.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._2)).map(_._3)
      val sessions = ordered.tail.foldLeft(List(List(ordered.head))) {
        case (acc @ cur :: done, t) =>
          if (t - cur.head > gapUs) List(t) :: acc
          else (t :: cur) :: done
        case (Nil, t) => List(List(t))
      }.reverse
      sessions.zipWithIndex.map { case (s, i) =>
        (u, (i + 1).toLong, s.length.toLong, s.min, s.max)
      }
    }.sorted
    assert(got == want)
  }

  test("sessionize: session count equals gap-boundary count on real events") {
    // invariant: total sessions = users + number of strictly-greater
    // gaps between a user's consecutive events (each opens exactly one
    // new session) — computed here via an independent lag encoding
    val ev = Tables(spark, sfDir).events
    val sessions = Funnel.sessionize(ev, col("user_id"), col("ts"),
      col("event_id"), gapSec = 1800L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = ev.withColumn("__prev", lag(col("ts"), 1).over(w))
      .filter(col("__prev").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("__prev")) > 1800L * 1000000L)
      .count()
    val users = ev.select("user_id").distinct().count()
    assert(sessions.count() == users + gaps)
    // sessions partition the events: per-user event counts must agree
    assert(sessions.agg(sum(col("n_events"))).head.getLong(0) == ev.count())
  }

  test("funnelStages: user counts are monotone non-increasing on real events") {
    val ev = Tables(spark, sfDir).events
    val users = Funnel.funnelStages(ev, col("user_id"), col("ts"),
      col("event_type"), Seq("view", "click", "purchase", "error"))
      .orderBy("stage_idx").collect().map(_.getLong(2))
    assert(users.sliding(2).forall { case Array(a, b) => b <= a; case _ => true })
  }

  test("cohortRetention: offsets are whole weeks from the user's first event") {
    val df = Seq(
      (1L, ts(0)),            // epoch Thu 1970-01-01 → cohort Mon 1969-12-29
      (1L, ts(6L * 86400)),   // +6 days → offset 0
      (1L, ts(7L * 86400)),   // +7 days → offset 1
      (2L, ts(14L * 86400))).toDF("u", "t")
    val out = Funnel.cohortRetention(df, col("u"), col("t"))
      .orderBy("cohort_week", "week_offset").collect()
    assert(out.map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("1969-12-29", 0L, 1L), ("1969-12-29", 1L, 1L), ("1970-01-12", 0L, 1L)))
  }

  test("transitions: hand-computed adjacency counts with id tiebreak") {
    val df = Seq(
      (1L, ts(10), 1L, "a"), (1L, ts(10), 2L, "b"), (1L, ts(20), 3L, "a"),
      (2L, ts(5), 4L, "b"), (2L, ts(6), 5L, "b"))
      .toDF("u", "t", "id", "e")
    val out = Funnel.transitions(df, col("u"), col("t"), col("id"), col("e"))
      .orderBy("event", "next_event").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("a", "b", 1L), ("b", "a", 1L), ("b", "b", 1L)))
  }

  test("resampleFillForward: epoch-aligned grid with forward fill") {
    // key 1 observes at t=90 (v=1.0) and t=250 (v=2.0); step 100 →
    // grid {100, 200} : v(100)=1.0 (from 90), v(200)=1.0
    val obs = Seq((1L, ts(90), 1.0), (1L, ts(250), 2.0)).toDF("k", "t", "v")
    val out = Resample.resampleFillForward(obs, "k", "t", 100L, Seq("v"))
      .orderBy("grid_ts").collect()
    assert(out.map(r => (r.getTimestamp(1).getTime / 1000, r.getDouble(2))).toSeq ==
      Seq((100L, 1.0), (200L, 1.0)))
  }

  test("resampleFillForward: single observation inside one step yields no grid") {
    val obs = Seq((1L, ts(150), 1.0)).toDF("k", "t", "v")
    // first aligned point is 200 > max ts 150 → empty
    assert(Resample.resampleFillForward(obs, "k", "t", 100L, Seq("v")).isEmpty)
  }

  test("histogram: width_bucket bounds and under/overflow buckets") {
    val df = Seq(("g", -1.0), ("g", 0.0), ("g", 4.9), ("g", 5.0), ("g", 10.0))
      .toDF("grp", "v")
    val out = Resample.histogram(df, col("grp"), col("v"), 0.0, 10.0, 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toSeq
    // -1 → bucket 0; 0,4.9 → bucket 1 [0,5); 5 → bucket 2 [5,10); 10 → bucket 3
    assert(out == Seq((0L, -5.0, 0.0, 1L), (1L, 0.0, 5.0, 2L),
      (2L, 5.0, 10.0, 1L), (3L, 10.0, 15.0, 1L)))
  }

  test("bloom: no false negatives, and FPR within 5x of theory") {
    val keys = (0L until 2000L).map(i => s"key_$i")
    val inSet = keys.take(1000).toDF("k")
    val probeAll = keys.toDF("k")
    val mBits = 1L << 14 // 16384 bits, n=1000, k=5 → theoretical FPR ~ 0.0094
    val bloom = Bloom.build(inSet, col("k"), mBits, 5)
    val flagged = Bloom.mightContain(probeAll, col("k"), bloom, mBits, 5)
    val hits = flagged.filter(col("might_contain")).select("k")
      .collect().map(_.getString(0)).toSet
    assert(keys.take(1000).forall(hits.contains), "false negative!")
    val fp = hits.size - 1000
    assert(fp <= (0.0094 * 5 * 1000).toInt,
      s"false-positive count $fp exceeds 5x theoretical bound")
  }

  test("bloom probe tolerates word/word_idx probe columns, rejects __bloom_*") {
    val inSet = Seq("a", "b").toDF("k")
    val bloom = Bloom.build(inSet, col("k"), 1 << 10, 3)
    // a probe relation that happens to carry the bloom table's own
    // column names must join cleanly (bloom side renamed internally)
    val probe = Seq(("a", 1L, 7L), ("z", 2L, 8L))
      .toDF("k", "word_idx", "word")
    val out = Bloom.mightContain(probe, col("k"), bloom, 1 << 10, 3)
    assert(out.columns.toSeq == Seq("k", "word_idx", "word", "might_contain"))
    val byKey = out.collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(byKey("a") && !byKey("z"))
    // reserved working prefix is rejected, not silently mis-grouped
    intercept[IllegalArgumentException] {
      Bloom.mightContain(Seq(("a", 1L)).toDF("k", "__bloom_pos"),
        col("k"), bloom, 1 << 10, 3)
    }
  }

  test("editSimilarityJoin equals the naive all-pairs join") {
    val names = Tables(spark, sfDir).part.limit(120)
      .select(col("p_partkey").as("id"), col("p_name").as("s"))
    val blocked = EditJoin.editSimilarityJoin(names, "id", "s", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = names.select(col("id").as("id_a"), col("s").as("sa"))
    val b = names.select(col("id").as("id_b"), col("s").as("sb"))
    val naive = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= 4)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == naive && naive.nonEmpty)
  }

  test("editSimilarityJoin string contraction is exact on a clone-heavy corpus") {
    // 3 exact copies of every name (plus the organic duplicates part
    // names already carry): intra-clone pairs must come out at dist 0
    // and cross pairs must match the naive join exactly
    val base = Tables(spark, sfDir).part.limit(60)
      .select(col("p_partkey").as("id"), col("p_name").as("s"))
    val names = base
      .unionByName(base.select((col("id") + 100000).as("id"), col("s")))
      .unionByName(base.select((col("id") + 200000).as("id"), col("s")))
    val blocked = EditJoin.editSimilarityJoin(names, "id", "s", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = names.select(col("id").as("id_a"), col("s").as("sa"))
    val b = names.select(col("id").as("id_b"), col("s").as("sb"))
    val naive = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= 3)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == naive && naive.nonEmpty)
  }

  test("editSimilarityJoin: cross-length-boundary pairs survive the blocking") {
    // lengths 3 and 5 with d=2: must meet in a shared bin
    val df = Seq((1L, "abc"), (2L, "abcde"), (3L, "zzzzzzzz")).toDF("id", "s")
    val out = EditJoin.editSimilarityJoin(df, "id", "s", 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((1L, 2L, 2)))
  }

  test("prefilteredAntiJoin equals the plain anti join") {
    val archive = (0L until 500L).filter(_ % 3 == 0).map(i => s"id$i").toDF("key")
    val batch = (0L until 500L).filter(_ % 2 == 0)
      .map(i => (i, s"id$i")).toDF("n", "key")
    val viaBloom = Bloom.prefilteredAntiJoin(batch, "key", archive, "key",
        mBits = 1L << 12, k = 4)
      .select("n").collect().map(_.getLong(0)).toSet
    val plain = batch.join(archive, Seq("key"), "left_anti")
      .select("n").collect().map(_.getLong(0)).toSet
    assert(viaBloom == plain)
  }
}
