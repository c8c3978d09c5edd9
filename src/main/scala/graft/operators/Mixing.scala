package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixture resampling — downsample each source/domain at its
  * own rate so the retained corpus hits a target mixture (the
  * "2 parts web, 1 part code, 4 parts books" step of pretraining
  * data assembly).
  *
  * The gate is the same deterministic md5-digit device as
  * `TextFns.hashSample`, extended to a PER-ROW rate: a row survives
  * iff the first hex digit of md5(key) falls below its domain's
  * accepted share of the 16 digit values. Determinism is the point —
  * the sample is reproducible across engines, retries, executors,
  * and partitionings, and two pipeline runs select the SAME rows
  * (rand()-based sampling cannot promise any of that). Granularity
  * is 1/16 per digit; sub-1/16 rates use the two-digit
  * [[hexBucket256]] strata (1/256 steps).
  *
  * Pure filter — no shuffle, no state; composes with any downstream
  * aggregation. At 100 TB this runs inside the scan's codegen stage.
  */
object Mixing {

  /** Value of the first md5 hex digit of `key`, 0..15 — the
    * uniform-deterministic bucket both Spark and any SQL oracle can
    * compute identically.
    */
  def hexBucket16(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 1), 16, 10).cast("int")

  /** Keep a row iff its bucket falls inside `sixteenths` (0..16) —
    * e.g. sixteenths=4 keeps a deterministic ~25%.
    */
  def mixGate(key: Column, sixteenths: Column): Column =
    hexBucket16(key) < sixteenths

  /** Probability-proportional-to-size (PPS) weighted subsampling:
    * keep each row with probability p_i = min(1, frac · n · wᵢ / Σw)
    * — a deterministic Poisson sample whose EXPECTED size is
    * `fracNum/fracDen` of the corpus and whose inclusion odds scale
    * with a per-ROW weight (quality score, token count, dedup-cluster
    * mass). The clamp at 1 means the expected size is exactly
    * `fracNum/fracDen` of the corpus only while no row saturates;
    * saturated rows (always kept, p_keep = 1) shave the expectation
    * below the target — callers weighting by 1/p_keep
    * (Horvitz–Thompson) stay unbiased either way because p_keep is
    * a true probability. The per-row continuous weight is what
    * [[stratifiedSample]]'s per-stratum constants and
    * [[tokenBudgetSample]]'s hard budgets can't express: e.g. weight
    * = token count makes every TOKEN equally likely to survive, the
    * compute-matched way to thin a corpus.
    *
    * Engine-exact determinism without integers-only arithmetic: the
    * uniform uᵢ is the first 13 md5 hex digits over 2⁵² (both exact
    * doubles), weights are caller-provided fixed-point longs, Σw and
    * n are exact integer aggregates, and the acceptance expression
    * uses ONLY IEEE +,×,÷ in a fixed left-associated order — every
    * one correctly rounded, hence bit-identical in any engine that
    * replays the same tree (ln/pow, which are not correctly rounded,
    * never appear). A SQL oracle replays the gate verbatim.
    *
    * Shape at scale: one 1-row aggregate broadcast back over the
    * scan; the gate itself is a pure projection inside the scan's
    * codegen stage — no shuffle, no state, no skew surface. Rows with
    * weight 0 are never kept; an all-zero-weight corpus yields an
    * empty sample (guarded before the NaN-producing division, whose
    * comparison semantics differ across engines).
    */
  def weightedSample(docs: DataFrame, key: Column, weight: Column,
                     fracNum: Int, fracDen: Int): DataFrame = {
    require(fracNum >= 0 && fracDen > 0, s"bad fraction $fracNum/$fracDen")
    val totals = docs.agg(
      sum(weight.cast("long")).as("__tw"), count(lit(1)).as("__n"))
    val u = conv(substring(md5(key.cast("string")), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0) // 2^52
    val p = least(lit(1.0),
      lit(fracNum.toDouble) / lit(fracDen.toDouble) *
        col("__n").cast("double") * weight.cast("long").cast("double") /
        col("__tw").cast("double"))
    docs.crossJoin(broadcast(totals))
      .filter(col("__tw") > 0L)
      .withColumn("p_keep", p)
      .filter(u < col("p_keep"))
      .drop("__tw", "__n")
  }

  /** Per-group [[weightedSample]]: the acceptance probability
    * normalizes within each GROUP (p_i = frac · n_g · wᵢ / Σw_g), so
    * every group is thinned to the same expected fraction while
    * inclusion odds inside a group still scale with the per-row
    * weight — "keep ~¼ of every language, preferring high-weight
    * docs", the grouped form the global normalizer can't express
    * (a token-heavy language would otherwise eat the whole budget).
    * Same engine-exact determinism contract; the totals relation is
    * group-cardinality-sized and broadcasts. The totals join is
    * null-SAFE: rows with a NULL group form their own stratum and
    * are sampled like any other, never silently dropped.
    */
  def weightedSamplePerGroup(docs: DataFrame, key: Column, group: Column,
                             weight: Column, fracNum: Int,
                             fracDen: Int): DataFrame = {
    require(fracNum >= 0 && fracDen > 0, s"bad fraction $fracNum/$fracDen")
    val totals = docs.groupBy(group.as("__grp"))
      .agg(sum(weight.cast("long")).as("__tw"), count(lit(1)).as("__n"))
    val u = conv(substring(md5(key.cast("string")), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0) // 2^52
    val p = least(lit(1.0),
      lit(fracNum.toDouble) / lit(fracDen.toDouble) *
        col("__n").cast("double") * weight.cast("long").cast("double") /
        col("__tw").cast("double"))
    docs.join(broadcast(totals), group <=> col("__grp"))
      .filter(col("__tw") > 0L)
      .withColumn("p_keep", p)
      .filter(u < col("p_keep"))
      .drop("__grp", "__tw", "__n")
  }

  /** Filter `docs` to the target mixture. `rates` maps domain value →
    * accepted sixteenths; unlisted domains fall back to
    * `defaultSixteenths`. The rate map is parameter-sized and folds
    * into the filter expression as a CASE chain — no join, no
    * broadcast state.
    */
  def domainMix(docs: DataFrame, key: Column, domain: Column,
                rates: Map[String, Int], defaultSixteenths: Int = 16): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 16),
      "rates are sixteenths in [0,16]")
    val rate = rates.foldLeft(lit(defaultSixteenths)) { case (acc, (dom, r)) =>
      when(domain === lit(dom), lit(r)).otherwise(acc)
    }
    docs.filter(mixGate(key, rate))
  }

  /** 0..255 bucket from the first TWO md5 hex digits — the finer
    * deterministic stratum for rates below 1/16 (1/256 granularity).
    * Same cross-engine contract as [[hexBucket16]]: any SQL oracle
    * reproduces it from md5 digits alone.
    */
  def hexBucket256(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("int")

  /** Deterministic train/val/test (or any k-way) split assignment:
    * each row's md5 256-bucket lands it in one named slice of the
    * cumulative `shares` layout (shares sum to 256). The reproducible
    * replacement for `randomSplit` — assignment is a pure projection
    * of the key (stable across runs, engines, and repartitioning;
    * any SQL oracle replays it from md5 digits), and a document's
    * split never changes when the corpus around it grows, the
    * property leakage audits depend on.
    */
  def splitAssign(key: Column, shares: Seq[(String, Int)]): Column = {
    require(shares.nonEmpty && shares.forall(_._2 > 0),
      s"shares must be positive: $shares")
    require(shares.map(_._2).sum == 256,
      s"shares must sum to 256 (1/256 granularity): $shares")
    val b = hexBucket256(key)
    val cuts = shares.scanLeft(0) { case (acc, (_, s)) => acc + s }.tail
    shares.zip(cuts).init.foldRight(lit(shares.last._1): Column) {
      case (((name, _), cut), rest) => when(b < cut, name).otherwise(rest)
    }
  }

  /** Temperature-based domain mixture (α = 0.5): resample so each
    * domain's retained share follows p_d^α instead of its natural
    * share p_d — the standard move that up-weights rare domains
    * (languages, sources) without duplicating rows. The acceptance
    * rate for domain d is p_d^(α-1) normalized so the rarest domain
    * keeps everything: rate_d = sqrt(n_min / n_d).
    *
    * α is PINNED at 0.5 because that makes the rate IEEE-exact on
    * every engine: n_min/n_d is a correctly-rounded double division,
    * sqrt is correctly rounded by the standard, and ×256 is a
    * power-of-two scaling (exact) — so `floor(rate·256)` is
    * bit-identical in Spark and any SQL oracle, and the 256-bucket
    * gate selects the SAME rows everywhere. A free-α variant would
    * ride on `pow`, whose last-ulp rounding is not cross-engine
    * portable.
    *
    * Two keyed aggregations over domain counts (parameter-sized
    * result), one broadcast join, then the same pure-filter gate as
    * [[domainMix]] — nothing global, nothing quadratic.
    */
  def temperatureMix(docs: DataFrame, key: Column, domain: Column): DataFrame = {
    val counts = docs.groupBy(domain.as("__dom")).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__n_min"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("__dom"),
        floor(sqrt(col("__n_min").cast("double") / col("__n").cast("double"))
          * lit(256)).cast("int").as("__keep256"))
    docs.join(broadcast(rates), domain === col("__dom"))
      .filter(hexBucket256(key) < col("__keep256"))
      .drop("__dom", "__keep256")
  }

  /** Deterministic epoch shuffle + sharding — the "global shuffle"
    * a training data loader needs, as a plan: every epoch draws a
    * fresh pseudo-random total order (md5 over epoch:key), rows are
    * hash-sharded, and each row gets its position within its shard.
    * Reproducible across engines, retries, and partitionings — the
    * property `ORDER BY rand()` cannot give — so epoch N's batch
    * schedule is replayable anywhere.
    *
    * One shuffle (the per-shard window). Shard cardinality is the
    * parallelism knob: at cluster scale numShards is chosen ≥ the
    * writer parallelism and each shard sorts independently —
    * per-shard order is what a loader consumes, so no global sort is
    * ever needed.
    */
  def epochShuffle(docs: DataFrame, key: Column, epoch: Int,
                   numShards: Int): DataFrame = {
    require(numShards >= 1 && numShards <= 256, "numShards in [1,256]")
    import org.apache.spark.sql.expressions.Window
    val ord = md5(concat_ws(":", lit(epoch), key.cast("string")))
    val shard = pmod(hexBucket256(ord), lit(numShards))
    val w = Window.partitionBy(col("shard")).orderBy(col("__ord"), key)
    docs.withColumn("__ord", ord).withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
      .drop("__ord")
  }

  /** Per-group cap via deterministic hash rank: keep at most `cap`
    * rows of every group, chosen by md5 order (a reproducible uniform
    * draw, ties broken on the key itself). The class-balancing /
    * per-source-quota step of corpus assembly. One keyed window
    * shuffle; groups under the cap pass through whole.
    */
  def capPerGroup(df: DataFrame, key: Column, group: Column, cap: Int): DataFrame = {
    require(cap >= 1)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(md5(key.cast("string")), key)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap).drop("__rk")
  }

  /** Stratified deterministic sample: each stratum value keeps rows
    * whose 256-bucket falls under its own acceptance threshold
    * (`rates256` maps stratum → kept buckets out of 256; unlisted
    * strata fall back to `default256`). Like [[domainMix]] this folds
    * to a CASE chain inside a pure filter — no join, no shuffle, no
    * state — so at corpus scale it runs inside the scan's codegen
    * stage, and the selected rows are identical on every engine,
    * retry, and partitioning.
    */
  def stratifiedSample(docs: DataFrame, key: Column, stratum: Column,
                       rates256: Map[String, Int],
                       default256: Int = 256): DataFrame = {
    require(rates256.values.forall(r => r >= 0 && r <= 256),
      "rates are 256ths in [0,256]")
    val rate = rates256.foldLeft(lit(default256)) { case (acc, (v, r)) =>
      when(stratum === lit(v), lit(r)).otherwise(acc)
    }
    docs.filter(hexBucket256(key) < rate)
  }

  /** Token-budget sampling: within each group, take documents in a
    * deterministic md5 priority order until the token budget fills —
    * the step that actually CUTS a training mix to its per-domain
    * token allocation (q125 computes the budgets; this spends them).
    * A doc is kept iff the tokens of all strictly-prior docs stay
    * under `budget` — so the budget may overshoot by at most one
    * document (the standard fill rule: every non-empty group keeps
    * ≥ 1 doc, and re-running with the same budget is a no-op on the
    * survivors).
    *
    * One keyed window (group-partitioned running sum) — exact integer
    * arithmetic, reproducible across engines/retries/partitionings,
    * same determinism contract as [[epochShuffle]]/[[capPerGroup]].
    * Returns (id, group, n_tok, cum_before) for the kept docs.
    */
  def tokenBudgetSample(docs: DataFrame, group: Column, key: Column,
                        nTok: Column, budget: Long): DataFrame = {
    require(budget >= 1)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp"))
      .orderBy(md5(col("id").cast("string")), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(key.as("id"), group.as("grp"), nTok.cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .filter(col("cum_before") < budget)
  }
}
