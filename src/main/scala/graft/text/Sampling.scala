package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling & leakage-safe splitting for training-data
 * pipelines (the operations a corpus-preparation run needs between dedup
 * and batching; companions to the reference's dataset assembly at
 * `/root/reference/relik/retriever/data/datasets.py` — the reference
 * shuffles/subsamples in-memory, which cannot work at corpus scale).
 *
 * Scale + reproducibility design:
 *  - Decisions are pure per-row functions of (key, salt) — no RNG state, no
 *    `rand()` (nondeterministic under task retries!), no shuffle, no
 *    driver coordination; a resumed or re-partitioned job samples
 *    IDENTICALLY.
 *  - The uniform variate is the first 8 hex chars of md5(key ⊕ salt)
 *    compared against a precomputed hex threshold — string comparison on
 *    fixed-width lowercase hex equals numeric comparison, and md5 is
 *    available bit-identically in every engine (exact cross-engine
 *    replay, unlike xxhash64 seeds or Spark's `rand`).
 *  - `groupSplit` assigns the WHOLE group by hashing the group key:
 *    same-entity/same-cluster rows can never straddle train/test — the
 *    leakage rule every ER/linkage paper requires.
 */
object Sampling {

  /** Hex threshold for a rate in [0,1] over the first 8 md5 hex chars. */
  private def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val v = math.min((rate * 4294967296.0).toLong, 4294967295L)
    f"$v%08x"
  }

  /** Uniform [0,1)-equivalent hex variate for a key column. */
  def unitHex(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt)).cast("binary")), 1, 8)

  /**
   * Deterministic Bernoulli sample: keep rows with variate < rate.
   * Exact replay: `substring(md5(key || salt), 1, 8) < '<thresholdHex>'`
   * in any engine with md5.
   */
  def deterministicSample(df: DataFrame, keyCol: String, rate: Double,
                          salt: String = "graft"): DataFrame =
    df.filter(unitHex(col(keyCol), salt) < lit(thresholdHex(rate)))

  /** Integer variate in [0, 2^32) for a key column — the numeric twin of
    * [[unitHex]] for PER-ROW thresholds (a hex threshold can only be
    * precomputed for a constant rate). */
  def unitLong(key: Column, salt: String): Column =
    conv(unitHex(key, salt), 16, 10).cast("long")

  /**
   * Deterministic weighted (importance) sample: keep a row iff its unit
   * variate < weight · 2^32, where `weight` is a per-row acceptance
   * probability (e.g. a quality score — upweight clean prose, downweight
   * boilerplate), clamped to [0,1]. Same guarantees as
   * [[deterministicSample]]: pure per-row decision, retry/partition
   * invariant, zero shuffle; and monotone — lowering a row's weight can
   * only remove it from the sample, never admit it (same key ⇒ same
   * variate). Exact cross-engine replay:
   * `CAST(concat('0x', substr(md5(key || salt), 1, 8)) AS BIGINT)
   *    < weight * 4294967296.0`.
   */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
                     salt: String = "graft-weighted"): DataFrame =
    df.filter(unitLong(col(keyCol), salt).cast("double") <
      greatest(lit(0.0), least(lit(1.0), weight)) * 4294967296.0)

  /**
   * Per-domain quota (domain balancing): keep at most `k` documents per
   * registrable domain, preferring the highest `score`, ties broken by
   * ascending `keyCol` — a total order when the key is unique, so the
   * kept set is unique and partition-invariant. This is the sampling-stage
   * mirror of the head-domain skew the blocking layer salts against
   * ([[Urls.domainStats]]): uncapped, the head domains dominate a web
   * corpus (CCNet/RefinedWeb both bound per-domain contribution).
   *
   * Scale shape: deliberately the DECLARATIVE `row_number() <= k` window —
   * Catalyst's WindowGroupLimit rewrite (Spark ≥ 3.5) turns a rank-limit
   * filter into a bounded per-group top-k BOTH map-side (Partial, before
   * the exchange: each input split ships ≤ k rows per domain) and
   * reduce-side (Final, before the Window: the rank operator never
   * buffers more than k rows per group). A head domain with 10^8 pages
   * costs each task O(k) memory and the shuffle O(k · splits) rows —
   * unlike the unbounded-window shapes BASELINE.md lesson 5 bans
   * (whole-group `count(*)`/`lead()` windows, which have no limit to push
   * and DO buffer entire groups). PlanQualitySpec pins the Partial
   * WindowGroupLimit below the Exchange so a regression in the rewrite
   * (e.g. a non-rank-like reformulation) fails the suite.
   */
  def domainQuota(df: DataFrame, keyCol: String, score: Column, k: Int,
                  urlCol: String = "url"): DataFrame = {
    require(k >= 1, s"quota must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(score.desc, col(keyCol).asc)
    df.withColumn("domain", Urls.registrableDomain(Urls.host(col(urlCol))))
      .withColumn("quota_rank", row_number().over(w))
      .filter(col("quota_rank") <= k)
  }

  /**
   * Leakage-safe split column: every row of a group gets the same split
   * label, chosen by the group key's variate against cumulative weight
   * thresholds. Weights need not sum to 1 (normalized internally).
   */
  def groupSplit(df: DataFrame, groupCol: String,
                 weights: Seq[(String, Double)],
                 salt: String = "graft-split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0))
    val total = weights.map(_._2).sum
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val v = unitHex(col(groupCol), salt)
    val expr = weights.zip(cum).dropRight(1).foldRight(
        lit(weights.last._1): Column) { case (((name, _), c), acc) =>
      when(v < lit(thresholdHex(c)), name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }
}
