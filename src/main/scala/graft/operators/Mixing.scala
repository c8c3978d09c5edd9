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
}
