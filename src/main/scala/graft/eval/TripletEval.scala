package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Relation-extraction evaluation (SURVEY.md §2.5 A3/A4, RE side): the
 * Spark reframing of the reference's StrongMatching for triplets
 * (`/root/reference/relik/reader/utils/relation_matching_eval.py:13-237`)
 * and its per-relation breakdown (`:240-341`), with the reference's
 * safe-divide metric arithmetic (`relik/reader/utils/metrics.py:1-18`).
 *
 * Inputs are flat triplet tables (one row per triplet):
 *   (doc_id, s_start, s_end, s_label, relation, o_start, o_end, o_label)
 *
 * Match predicates, exactly as the reference builds its tuple sets:
 *  - BOUNDARY match drops the span entity labels (the reference substitutes
 *    `-1` for both subject/object types, `relation_matching_eval.py:142-168`)
 *  - STRICT match includes them (`:53-80`).
 * Both joins are set-intersections (dedup'd), hash-partitioned on the full
 * tuple — no per-doc loop, scales to any corpus.
 */
object TripletEval {

  private val boundaryKey = Seq("doc_id", "s_start", "s_end", "relation", "o_start", "o_end")
  private val strictKey = boundaryKey ++ Seq("s_label", "o_label")

  private def safeDiv(num: Column, den: Column): Column =
    when(den === 0, 0.0).otherwise(num.cast("double") / den)

  private def f1(p: Column, r: Column): Column =
    when(p === 0.0 || r === 0.0, 0.0).otherwise(lit(2.0) * p * r / (p + r))

  /**
   * Corpus-level boundary + strict triplet counts and P/R/F1 (one row):
   * (n_gold, n_pred, correct_bound, correct_strict, precision/recall/f1 for
   * both predicates). ONE lazy plan (a full-outer set join per predicate +
   * a 1-row aggregate each, cross-combined) — no driver-side actions, so it
   * composes into larger plans and the oracle harness can run it as-is.
   */
  def strongMatching(pred: DataFrame, gold: DataFrame): DataFrame = {
    def confusion(key: Seq[String], suffix: String): DataFrame = {
      val p = pred.select(key.map(col): _*).distinct().withColumn("in_p", lit(1L))
      val g = gold.select(key.map(col): _*).distinct().withColumn("in_g", lit(1L))
      p.join(g, key, "full_outer").agg(
        sum(coalesce(col("in_p"), lit(0L))).as(s"n_pred$suffix"),
        sum(coalesce(col("in_g"), lit(0L))).as(s"n_gold$suffix"),
        sum(coalesce(col("in_p"), lit(0L)) * coalesce(col("in_g"), lit(0L)))
          .as(s"correct$suffix"))
    }
    // each predicate uses its own set cardinalities as denominators (the
    // reference builds the -1-substituted tuples as a SET, so boundary
    // totals are boundary-distinct counts)
    confusion(boundaryKey, "_bound")
      .crossJoin(confusion(strictKey, "_strict")) // 1-row × 1-row
      .select(
        col("n_gold_strict").as("n_gold"), col("n_pred_strict").as("n_pred"),
        col("n_gold_bound"), col("n_pred_bound"),
        col("correct_bound"), col("correct_strict"))
      .withColumn("precision_bound", safeDiv(col("correct_bound"), col("n_pred_bound")))
      .withColumn("recall_bound", safeDiv(col("correct_bound"), col("n_gold_bound")))
      .withColumn("f1_bound", f1(col("precision_bound"), col("recall_bound")))
      .withColumn("precision_strict", safeDiv(col("correct_strict"), col("n_pred")))
      .withColumn("recall_strict", safeDiv(col("correct_strict"), col("n_gold")))
      .withColumn("f1_strict", f1(col("precision_strict"), col("recall_strict")))
  }

  /**
   * Per-relation P/R/F1 breakdown (`relation_matching_eval.py:240-341`):
   * one row per relation appearing in GOLD (the reference iterates
   * `total_gold.keys()`), with boundary and strict counts. `support` is the
   * gold triplet count. A full-outer on relation would also surface
   * precision-0 relations predicted but never gold — the reference drops
   * them, so we do too.
   */
  def perRelation(pred: DataFrame, gold: DataFrame): DataFrame = {
    val p = pred.select(strictKey.map(col): _*).distinct()
    val g = gold.select(strictKey.map(col): _*).distinct()
    val predByRel = p.groupBy(col("relation")).agg(count(lit(1)).as("n_pred"))
    val goldByRel = g.groupBy(col("relation")).agg(count(lit(1)).as("support"))
    val strictByRel = p.join(g, strictKey, "left_semi")
      .groupBy(col("relation")).agg(count(lit(1)).as("correct_strict"))
    val boundByRel = p.select(boundaryKey.map(col): _*).distinct()
      .join(g.select(boundaryKey.map(col): _*).distinct(), boundaryKey, "left_semi")
      .groupBy(col("relation")).agg(count(lit(1)).as("correct_bound"))

    goldByRel
      .join(predByRel, Seq("relation"), "left")
      .join(boundByRel, Seq("relation"), "left")
      .join(strictByRel, Seq("relation"), "left")
      .na.fill(0L, Seq("n_pred", "correct_bound", "correct_strict"))
      .withColumn("precision", safeDiv(col("correct_bound"), col("n_pred")))
      .withColumn("recall", safeDiv(col("correct_bound"), col("support")))
      .withColumn("f1", f1(col("precision"), col("recall")))
      .withColumn("precision_strict", safeDiv(col("correct_strict"), col("n_pred")))
      .withColumn("recall_strict", safeDiv(col("correct_strict"), col("support")))
      .withColumn("f1_strict", f1(col("precision_strict"), col("recall_strict")))
  }
}
