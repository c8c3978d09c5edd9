package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over an event stream: staged funnels, cohort
  * retention, and event-transition matrices — the product-analytics
  * counterpart of the reference's scan pipelines (reference drives the
  * same shape client-side: fetch rows per entity, then count stage
  * survivors in Python; here each stage is one keyed aggregation).
  *
  * Scale shape: every stage/cohort step shuffles on the SAME key
  * (`user`), so Spark reuses the exchange across steps instead of
  * re-partitioning; the per-stage boundary tables are user-cardinality
  * (≪ event cardinality) and join back onto events as hash joins. No
  * windows over the whole event relation, no driver state.
  */
object Funnel {

  /** Ordered funnel completion: for each stage i (an `event` value),
    * a user reaches stage i at tᵢ = min(ts | event = stageᵢ ∧ ts ≥
    * tᵢ₋₁) — the earliest occurrence at-or-after their previous-stage
    * completion (>= : a same-timestamp later stage counts, matching
    * the oracle twin exactly).
    *
    * Returns one row per stage: (stage_idx, stage, users) with users
    * monotonically non-increasing down the funnel.
    *
    * Each stage is one filtered keyed agg + one hash join against the
    * previous stage's per-user completion table — at 100 TB the agg
    * is partial-aggregable (map-side min) and all shuffles share the
    * `user` hash partitioning.
    */
  def funnelStages(events: DataFrame, user: Column, ts: Column,
                   event: Column, stages: Seq[String]): DataFrame =
    funnelStagesWithin(events, user, ts, event, stages, maxGapSec = None)

  /** Funnel with a CONVERSION DEADLINE: stage i counts only if it
    * happens within `maxGapSec` seconds of the user's stage-(i-1)
    * completion (the "purchased within 7 days of the click" form).
    * `None` = unbounded (plain `funnelStages`). The gap compares at
    * µs precision — exact against an integer-arithmetic oracle.
    */
  def funnelStagesWithin(events: DataFrame, user: Column, ts: Column,
                         event: Column, stages: Seq[String],
                         maxGapSec: Option[Long]): DataFrame = {
    require(stages.nonEmpty)
    val base = events.select(user.as("__u"), ts.as("__ts"), event.as("__e"))
    // per-user completion time of each successive stage
    val completions: Seq[DataFrame] = stages
      .foldLeft(List.empty[DataFrame]) { case (acc, stage) =>
        val hits = base.filter(col("__e") === stage)
        val reached = acc match {
          case Nil => hits.groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
          case prev :: _ =>
            val inWindow = maxGapSec match {
              case Some(g) => unix_micros(col("__ts")) - unix_micros(col("__tprev")) <=
                g * 1000000L
              case None => lit(true)
            }
            hits.join(prev.select(col("__u"), col("__t").as("__tprev")), "__u")
              .filter(col("__ts") >= col("__tprev") && inWindow)
              .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
        }
        reached :: acc
      }.reverse
    val counts = completions.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage_idx"), lit(stages(i)).as("stage"),
          col("users"))
    }
    counts.reduce(_ unionByName _).orderBy("stage_idx")
  }

  /** Gap-based sessionization: a user's events (ordered by (ts, id) —
    * `id` the unique tiebreaker that makes the split deterministic)
    * start a new session wherever the gap from the previous event
    * EXCEEDS `gapSec` (µs-exact; a gap of exactly `gapSec` stays in
    * the session). Returns one row per session:
    * (user, session_seq, n_events, start_us, end_us), `session_seq`
    * the user's 1-based session index.
    *
    * The running sum over new-session flags is the standard
    * distributed encoding of "which session am I in": one window +
    * one keyed agg, BOTH on the `user` hash partitioning (the agg
    * key (user, session_seq) is a refinement, so the exchange is
    * reused), no per-session state, no driver loops. At 100 TB the
    * only skew risk is a single user with pathological event volume —
    * the same bound as every per-user window in this family.
    */
  def sessionize(events: DataFrame, user: Column, ts: Column, id: Column,
                 gapSec: Long): DataFrame = {
    require(gapSec > 0, "gapSec must be positive")
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__id"))
    events.select(user.as("__u"), ts.as("__ts"), id.as("__id"))
      .withColumn("__prev", lag(col("__ts"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
          unix_micros(col("__ts")) - unix_micros(col("__prev")) > gapSec * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__u"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("__ts"))).as("start_us"),
        max(unix_micros(col("__ts"))).as("end_us"))
      .withColumnRenamed("__u", "user")
  }

  /** Weekly cohort retention: cohort = ISO week (Monday-start date)
    * of the user's FIRST event of any type; for each (cohort_week,
    * week_offset) the number of distinct users from that cohort with
    * any activity `offset` whole weeks after their first event.
    *
    * Two keyed aggs (user grain, then cohort grain) + one hash join
    * of the user-cardinality first-event table back onto events.
    */
  def cohortRetention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val base = events.select(user.as("__u"), ts.as("__ts"))
    val firsts = base.groupBy(col("__u")).agg(min(col("__ts")).as("__t0"))
    base.join(firsts, "__u")
      .select(col("__u"),
        to_date(date_trunc("week", col("__t0"))).as("cohort_week"),
        // datediff >= 0 (t0 is the user's min ts), so floor-division
        // equals integer division — engine-exact, no fp edge
        floor(datediff(to_date(col("__ts")), to_date(col("__t0"))) / 7)
          .cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("__u")).as("users"))
  }

  /** Event-transition matrix: per user, order events by (ts, id) —
    * `id` is the unique tiebreaker that makes the sequence (and so
    * the oracle comparison) deterministic — and count each
    * (event, next_event) adjacency. One window over the user
    * partitioning + one partial-aggregable count.
    */
  def transitions(events: DataFrame, user: Column, ts: Column,
                  id: Column, event: Column): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__id"))
    events.select(user.as("__u"), ts.as("__ts"), id.as("__id"), event.as("__e"))
      .withColumn("__next", lead(col("__e"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("__e").as("event"), col("__next").as("next_event"))
      .agg(count(lit(1)).as("n"))
  }
}
