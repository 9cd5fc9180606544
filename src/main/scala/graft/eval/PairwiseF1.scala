package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pairwise P/R/F1 over labeled same-blocking-key pairs (BASELINE.json:metric)
 * — the StrongMatching analog (SURVEY.md §2.5 A3; reference protocol at
 * `/root/reference/relik/reader/utils/strong_matching_eval.py:11-127`:
 * micro P/R/F1 with exact-match predicate, safe-divide at
 * `relik/reader/utils/metrics.py:1-18`).
 *
 * A labeled pair (url_a, url_b, is_match) is predicted positive iff both
 * urls land in the same predicted cluster. One broadcast-or-shuffle join per
 * side + a single global aggregate.
 */
object PairwiseF1 {

  case class Result(tp: Long, fp: Long, fn: Long, tn: Long) {
    def precision: Double = safeDiv(tp, tp + fp)
    def recall: Double = safeDiv(tp, tp + fn)
    def f1: Double = {
      val p = precision; val r = recall
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
    private def safeDiv(a: Long, b: Long): Double = if (b == 0) 0.0 else a.toDouble / b
    override def toString: String =
      f"P=$precision%.4f R=$recall%.4f F1=$f1%.4f (tp=$tp fp=$fp fn=$fn tn=$tn)"
  }

  /**
   * @param goldPairs (url_a, url_b, block_key, is_match)
   * @param clusters  (url, cluster_id)
   */
  def evaluate(goldPairs: DataFrame, clusters: DataFrame): Result = {
    val spark = goldPairs.sparkSession
    import spark.implicits._
    val ca = clusters.select($"url".as("url_a"), $"cluster_id".as("cid_a"))
    val cb = clusters.select($"url".as("url_b"), $"cluster_id".as("cid_b"))
    val joined = goldPairs
      .join(ca, Seq("url_a"), "left")
      .join(cb, Seq("url_b"), "left")
      .withColumn("pred", $"cid_a".isNotNull && $"cid_a" === $"cid_b")
    val agg = joined.agg(
      sum(when($"is_match" && $"pred", 1L).otherwise(0L)).as("tp"),
      sum(when(!$"is_match" && $"pred", 1L).otherwise(0L)).as("fp"),
      sum(when($"is_match" && !$"pred", 1L).otherwise(0L)).as("fn"),
      sum(when(!$"is_match" && !$"pred", 1L).otherwise(0L)).as("tn"))
      .as[(Long, Long, Long, Long)].first()
    Result(agg._1, agg._2, agg._3, agg._4)
  }

  /** Same confusion counts as a 1-row DataFrame (for Verify/oracle use). */
  def confusion(goldPairs: DataFrame, clusters: DataFrame): DataFrame = {
    val spark = goldPairs.sparkSession
    import spark.implicits._
    val ca = clusters.select($"url".as("url_a"), $"cluster_id".as("cid_a"))
    val cb = clusters.select($"url".as("url_b"), $"cluster_id".as("cid_b"))
    goldPairs
      .join(ca, Seq("url_a"), "left")
      .join(cb, Seq("url_b"), "left")
      .withColumn("pred", $"cid_a".isNotNull && $"cid_a" === $"cid_b")
      .agg(
        sum(when($"is_match" && $"pred", 1L).otherwise(0L)).as("tp"),
        sum(when(!$"is_match" && $"pred", 1L).otherwise(0L)).as("fp"),
        sum(when($"is_match" && !$"pred", 1L).otherwise(0L)).as("fn"),
        sum(when(!$"is_match" && !$"pred", 1L).otherwise(0L)).as("tn"))
  }

  /**
   * Candidate-miss diagnostics (the reference's main debugging split,
   * `/root/reference/relik/reader/utils/strong_matching_eval.py:86-127`:
   * for each gold annotation the reader missed, was the gold entity even IN
   * the candidate list — `miss_due_to_candidates` — or did the reader rank
   * it wrong?). ER reframing: split the pipeline's false negatives into
   *
   *   fn_not_candidate — the gold pair never survived blocking
   *                      (fix the blocker: more bands, wider keys), vs
   *   fn_scored_apart  — it WAS a candidate but the scorer/threshold/
   *                      clustering kept the pair apart (fix τ/weights).
   *
   * One lazy 1-row plan: (n_gold_pos, tp, fn_not_candidate, fn_scored_apart,
   * recall, blocking_recall).
   */
  def missDiagnostics(goldPairs: DataFrame, candidatePairs: DataFrame,
                      clusters: DataFrame): DataFrame = {
    val spark = goldPairs.sparkSession
    import spark.implicits._
    // canonicalize pair orientation on BOTH inputs before the is_cand join:
    // gold and candidate sets from different producers need not agree on
    // (a,b) vs (b,a) order, and a verbatim join would overcount
    // fn_not_candidate for every flipped pair. The cluster-id lookups are
    // orientation-independent (per-url joins).
    val pos = goldPairs.filter($"is_match").select(
      least($"url_a", $"url_b").as("url_a"), greatest($"url_a", $"url_b").as("url_b"))
    val ca = clusters.select($"url".as("url_a"), $"cluster_id".as("cid_a"))
    val cb = clusters.select($"url".as("url_b"), $"cluster_id".as("cid_b"))
    val cand = candidatePairs.select(
        least($"url_a", $"url_b").as("url_a"), greatest($"url_a", $"url_b").as("url_b"))
      .distinct()
      .withColumn("is_cand", lit(1L))
    pos
      .join(ca, Seq("url_a"), "left")
      .join(cb, Seq("url_b"), "left")
      .withColumn("pred", ($"cid_a".isNotNull && $"cid_a" === $"cid_b").cast("long"))
      .join(cand, Seq("url_a", "url_b"), "left")
      .agg(
        count(lit(1)).as("n_gold_pos"),
        sum($"pred").as("tp"),
        sum(when($"pred" === 0 && $"is_cand".isNull, 1L).otherwise(0L)).as("fn_not_candidate"),
        sum(when($"pred" === 0 && $"is_cand".isNotNull, 1L).otherwise(0L)).as("fn_scored_apart"),
        sum(coalesce($"is_cand", lit(0L))).as("n_candidates_hit"))
      .withColumn("recall",
        when($"n_gold_pos" === 0, 0.0).otherwise($"tp".cast("double") / $"n_gold_pos"))
      .withColumn("blocking_recall",
        when($"n_gold_pos" === 0, 0.0).otherwise($"n_candidates_hit".cast("double") / $"n_gold_pos"))
  }

  /** Blocking recall@candidates analog (SURVEY.md A4; reference
    * `scripts/data/retriever/add_candidates.py:20-53`): fraction of gold
    * matching pairs that survived into the candidate-pair set. */
  def blockingRecall(goldPairs: DataFrame, candidatePairs: DataFrame): Double = {
    val spark = goldPairs.sparkSession
    import spark.implicits._
    val pos = goldPairs.filter($"is_match")
    val hit = pos.join(candidatePairs.select("url_a", "url_b"), Seq("url_a", "url_b"), "left_semi")
    val (h, t) = (hit.count(), pos.count())
    if (t == 0) 1.0 else h.toDouble / t
  }
}
