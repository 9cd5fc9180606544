package graft.score

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.functions.{HashKernels, StringSimKernels}
import graft.schema.MatchEdge

/**
 * Pairwise scorer (SURVEY.md §2.4 J8): replaces the reference's reader
 * forward pass over (window × candidate) batches (`/root/reference/relik/
 * reader/pytorch_modules/hf/modeling_relik.py:239-456`) with a weighted
 * record-linkage similarity, and its relation-threshold filter
 * (`modeling_relik.py:927-930`) with the edge threshold (F3).
 *
 * Two implementations with identical semantics:
 *   - `score`: pure codegen'd Catalyst expressions (JaroWinkler,
 *     LevenshteinSim, MinHashOverlap) — the default; stays inside a single
 *     WholeStageCodegen span, no shuffle (pairs already carry both payloads).
 *   - `scoreTyped`: a typed `mapPartitions` batch kernel — the reference's
 *     token-budget-batched scorer shape (`relik_reader_data.py:781-810`),
 *     kept for operators that need per-partition scratch state (e.g. model
 *     weights). Used by tests to cross-check the expression path.
 */
object PairScorer {

  case class Weights(jaro: Double = 0.3, lev: Double = 0.1, jaccard: Double = 0.6)

  case class Config(weights: Weights = Weights(), threshold: Double = 0.50)

  /**
   * Input: candidate pairs with payloads (url_a, url_b, mention_a,
   * mention_b, sig_a, sig_b). Output: above-threshold MatchEdge rows.
   */
  def score(pairs: DataFrame, cfg: Config = Config()): DataFrame = {
    val jw = jaro_winkler(col("mention_a"), col("mention_b"))
    val lv = levenshtein_sim(col("mention_a"), col("mention_b"))
    val jc = minhash_overlap(col("sig_a"), col("sig_b"))
    pairs
      .withColumn("jaro", jw)
      .withColumn("lev_sim", lv)
      .withColumn("jaccard", jc)
      .withColumn("score",
        col("jaro") * cfg.weights.jaro +
        col("lev_sim") * cfg.weights.lev +
        col("jaccard") * cfg.weights.jaccard)
      .filter(col("score") >= cfg.threshold) // F3: edge threshold
      .select("url_a", "url_b", "jaro", "lev_sim", "jaccard", "score")
  }

  /** Typed row for the mapPartitions variant. */
  case class PairRow(
      url_a: String, url_b: String,
      mention_a: String, mention_b: String,
      sig_a: Array[Long], sig_b: Array[Long])

  /**
   * mapPartitions variant: batches a partition's rows and scores them with
   * the same kernels (per-partition scratch reuse; micro-batching mirrors
   * the reference's token-budget batching,
   * `/root/reference/relik/reader/data/relik_reader_data.py:781-810`).
   */
  def scoreTyped(pairs: Dataset[PairRow], cfg: Config = Config()): Dataset[MatchEdge] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val w = cfg.weights
    val tau = cfg.threshold
    pairs.mapPartitions { it =>
      it.flatMap { p =>
        val jw = StringSimKernels.jaroWinkler(p.mention_a, p.mention_b)
        val lv = {
          val a = org.apache.spark.unsafe.types.UTF8String.fromString(p.mention_a)
          val b = org.apache.spark.unsafe.types.UTF8String.fromString(p.mention_b)
          StringSimKernels.levenshteinSim(a, b)
        }
        val jc = {
          val n = math.min(p.sig_a.length, p.sig_b.length)
          var eq = 0; var i = 0
          while (i < n) { if (p.sig_a(i) == p.sig_b(i)) eq += 1; i += 1 }
          if (n == 0) 0.0 else eq.toDouble / n
        }
        val s = jw * w.jaro + lv * w.lev + jc * w.jaccard
        if (s >= tau) Some(MatchEdge(p.url_a, p.url_b, jw, lv, jc, s)) else None
      }
    }
  }
}
