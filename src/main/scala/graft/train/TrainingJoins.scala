package graft.train

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Retriever-training data joins — the J6/J7 operators of SURVEY.md §2.
 *
 * The reference prepares golden-retriever training batches in two steps:
 *
 *  1. J6 "positive-passage join"
 *     (reference: relik/retriever/data/datasets.py:486-513): per sample,
 *     deduplicate each context role (positives / negatives / hard
 *     negatives) by passage text, cap each role at `max_*`, and assemble
 *     the passage list as positives ++ negatives ++ hard-negatives; the
 *     positives' positions carry label 1
 *     (datasets.py:630-660 collate_fn builds the in-batch label matrix).
 *
 *  2. J7 "hard-negative attach"
 *     (reference: relik/retriever/callbacks/training_callbacks.py:186-203):
 *     after a retrieval pass, the hard negatives of a sample are the
 *     highest-ranked retrieved passages NOT in its gold set, in retrieval
 *     order, capped at `max_negatives`.
 *
 * Both are plain shuffles-on-qid joins here — no trainer, no tokenizer.
 * The reference's Python-`set` ordering is nondeterministic; this engine
 * fixes the tie-break to ascending passage id so results are replayable.
 */
object TrainingJoins {

  /** Role ordering of the assembled passage list (datasets.py:500). */
  private val roleOrder: Column =
    when(col("role") === "pos", 0).when(col("role") === "neg", 1).otherwise(2)

  /**
   * J6: per-sample passage assembly (datasets.py:486-513).
   *
   * Input `ctxs`: one row per retrieved context with columns
   * `(qid, cand_id, role ∈ {pos,neg,hneg}, pkey)` where `pkey` is a
   * content key of the passage text (the reference dedupes on raw text;
   * a 128-bit content hash is the at-scale equivalent).
   *
   * Output: `(qid, passage_id, role, pos, label)` — `pos` is the 0-based
   * position in the assembled list, `label` 1 for positives.
   *
   * Scale shape: ONE shuffle. All three windows cluster by a `qid` prefix,
   * so an explicit repartition on `qid` satisfies every window's required
   * distribution and Catalyst inserts only per-window sorts (verified by
   * TrainingJoinsSpec's plan assertion). Per-qid group size is bounded by
   * the retriever's top-k, so window buffers are O(k).
   */
  def assembleSamples(ctxs: DataFrame, maxPerRole: Int): DataFrame = {
    val byQid = ctxs.repartition(col("qid"))
    val wDedup = Window.partitionBy(col("qid"), col("role"), col("pkey"))
      .orderBy(col("cand_id"))
    val wCap = Window.partitionBy(col("qid"), col("role")).orderBy(col("cand_id"))
    val wPos = Window.partitionBy(col("qid")).orderBy(roleOrder, col("cand_id"))
    byQid
      .withColumn("dup_rn", row_number().over(wDedup)).filter(col("dup_rn") === 1)
      .withColumn("cap_rn", row_number().over(wCap)).filter(col("cap_rn") <= maxPerRole)
      .withColumn("pos", (row_number().over(wPos) - 1).cast("long"))
      .select(col("qid"), col("cand_id").as("passage_id"), col("role"), col("pos"),
        (col("role") === "pos").cast("long").as("label"))
  }

  /**
   * J6 collate step: in-batch label-matrix statistics (datasets.py:630-660).
   *
   * Questions are batched `questionsPerBatch` at a time; the batch's
   * passage pool is the distinct union of its samples' passages, and
   * label(q, p) = 1 iff p is one of q's positives. The full |Q|×|pool|
   * matrix is a trainer artifact; the join this engine owns is the pool
   * dedup + per-question positive count, emitted as
   * `(batch_id, qid, pool_size, n_pos)`.
   *
   * Scale shape: two partial-aggregable hash aggregates on `batch_id`
   * prefixes + a join on `batch_id` — no windows, no group buffers.
   */
  def inBatchLabelStats(samples: DataFrame, questionsPerBatch: Int): DataFrame = {
    val b = samples.withColumn("batch_id", floor(col("qid") / questionsPerBatch))
    val pool = b.groupBy(col("batch_id"))
      .agg(countDistinct(col("passage_id")).as("pool_size"))
    val perQ = b.groupBy(col("batch_id"), col("qid"))
      .agg(sum(col("label")).as("n_pos"))
    perQ.join(pool, Seq("batch_id"))
      .select(col("batch_id"), col("qid"), col("pool_size"), col("n_pos"))
  }

  /**
   * J7: hard-negative attach (training_callbacks.py:186-203).
   *
   * `preds`: retrieval output `(qid, cand_id, rank)` (rank 1 = best);
   * `gold`: the positive pairs `(qid, cand_id)`. Hard negatives are the
   * non-gold predictions in rank order, at most `maxNegatives` per qid.
   *
   * Output: `(qid, hn_rank, cand_id, orig_rank)`.
   *
   * Scale shape: gold is collapsed to a per-qid set first (bounded by the
   * retriever's top-k), so `preds` shuffles ONCE on `qid` for the join and
   * the rank window reuses that partitioning — versus a two-key anti-join,
   * which would shuffle preds on (qid, cand_id) and then again on qid.
   */
  def hardNegatives(preds: DataFrame, gold: DataFrame, maxNegatives: Int): DataFrame = {
    val goldSets = gold.groupBy(col("qid"))
      .agg(collect_set(col("cand_id")).as("gold_set"))
    val w = Window.partitionBy(col("qid")).orderBy(col("rank"))
    preds.join(goldSets, Seq("qid"), "left")
      .filter(col("gold_set").isNull || !array_contains(col("gold_set"), col("cand_id")))
      .withColumn("hn_rank", row_number().over(w).cast("long"))
      .filter(col("hn_rank") <= maxNegatives)
      .select(col("qid"), col("hn_rank"), col("cand_id"), col("rank").as("orig_rank"))
  }
}
