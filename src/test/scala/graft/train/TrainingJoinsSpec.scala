package graft.train

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * J6/J7 training joins (reference: relik/retriever/data/datasets.py:486-513,
 * 630-660; relik/retriever/callbacks/training_callbacks.py:186-203).
 */
class TrainingJoinsSpec extends SparkSpec {

  import spark.implicits._

  // (qid, cand_id, rank) retrievals for two queries; q1's gold = {11, 13}.
  private def preds: DataFrame = Seq(
    (1L, 11L, 1L), (1L, 12L, 2L), (1L, 13L, 3L), (1L, 14L, 4L), (1L, 15L, 5L),
    (2L, 21L, 1L), (2L, 22L, 2L)
  ).toDF("qid", "cand_id", "rank")

  private def gold: DataFrame =
    Seq((1L, 11L), (1L, 13L)).toDF("qid", "cand_id")

  test("J7: hard negatives are the non-gold predictions in rank order, capped") {
    val hn = TrainingJoins.hardNegatives(preds, gold, maxNegatives = 2)
      .orderBy("qid", "hn_rank").collect()
    // q1: 12 (rank 2) then 14 (rank 4); 15 capped away. q2 (no gold): 21, 22.
    assert(hn.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 1L, 12L, 2L), (1L, 2L, 14L, 4L), (2L, 1L, 21L, 1L), (2L, 2L, 22L, 2L)))
  }

  test("J7: gold passages never appear as hard negatives at any cap") {
    val hn = TrainingJoins.hardNegatives(preds, gold, maxNegatives = 10)
    assert(hn.join(gold, Seq("qid", "cand_id"), "inner").count() == 0)
    assert(hn.filter($"qid" === 1L).count() == 3) // 12, 14, 15
  }

  // ctxs: (qid, cand_id, role, pkey); q1 has a planted pkey dup in 'pos'.
  private def ctxs: DataFrame = Seq(
    (1L, 11L, "pos", "ka"), (1L, 12L, "pos", "ka"), (1L, 13L, "pos", "kb"),
    (1L, 14L, "neg", "kc"), (1L, 15L, "hneg", "kd"), (1L, 16L, "hneg", "ke"),
    (1L, 17L, "hneg", "kf"),
    (2L, 21L, "neg", "kg")
  ).toDF("qid", "cand_id", "role", "pkey")

  test("J6: dedup by content key, per-role cap, positives-first positions, labels") {
    val out = TrainingJoins.assembleSamples(ctxs, maxPerRole = 2)
      .orderBy("qid", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // q1: pos {11 (12 deduped by ka), 13}, neg {14}, hneg {15, 16} (17 capped).
    assert(out.toSeq == Seq(
      (1L, 11L, "pos", 0L, 1L), (1L, 13L, "pos", 1L, 1L), (1L, 14L, "neg", 2L, 0L),
      (1L, 15L, "hneg", 3L, 0L), (1L, 16L, "hneg", 4L, 0L),
      (2L, 21L, "neg", 0L, 0L)))
  }

  test("J6: assembled list order is positives ++ negatives ++ hard negatives") {
    val out = TrainingJoins.assembleSamples(ctxs, maxPerRole = 10)
      .filter($"qid" === 1L).orderBy("pos").select("role").as[String].collect()
    assert(out.toSeq == Seq("pos", "pos", "neg", "hneg", "hneg", "hneg"))
  }

  test("J6: result is invariant under input partition perturbation") {
    val a = TrainingJoins.assembleSamples(ctxs.repartition(7), maxPerRole = 2)
      .orderBy("qid", "pos").collect().toSeq
    val b = TrainingJoins.assembleSamples(ctxs.coalesce(1), maxPerRole = 2)
      .orderBy("qid", "pos").collect().toSeq
    assert(a == b)
  }

  test("J6 collate: pool dedups passages across the batch; n_pos counts labels") {
    // one batch (qid 1 and 2 share batch 0 at questionsPerBatch=50); passage
    // 14 appears for both questions and must count once in the pool.
    val shared = ctxs.union(Seq((2L, 14L, "neg", "kc")).toDF("qid", "cand_id", "role", "pkey"))
    val samples = TrainingJoins.assembleSamples(shared, maxPerRole = 2)
    val stats = TrainingJoins.inBatchLabelStats(samples, questionsPerBatch = 50)
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // pool = {11, 13, 14, 15, 16, 21} = 6 distinct passages
    assert(stats.toSeq == Seq((0L, 1L, 6L, 2L), (0L, 2L, 6L, 0L)))
  }

  test("J6 plan: one exchange total — all three windows reuse the qid partitioning") {
    val out = TrainingJoins.assembleSamples(ctxs, maxPerRole = 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // AQE prints the final and initial plan sections; count distinct nodes.
    val exchanges = """Exchange hashpartitioning[^\[]*\[plan_id=(\d+)\]""".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(exchanges.size == 1, s"expected 1 shuffle, got ${exchanges.size}:\n$plan")
  }
}
