package graft.spans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Relation-extraction (triplet) layer (SURVEY.md §2.5 A1 / reference RE
 * path): the reference's reader emits per-window triplets as span-INDEX
 * tuples and, when merging overlapping windows, re-references each triplet's
 * subject/object through the merged span list before set-union + sort
 * (`/root/reference/relik/inference/data/window/manager.py:400-430`).
 *
 * The columnar data model stores the subject/object spans INLINE in the
 * triplet (doc coordinates), so the merge's span re-indexing is implicit:
 * two windows that saw the same relation emit structurally identical rows,
 * and the union + dedup over (subject, relation, object) IS the reference's
 * `set(w1) ∪ set(w2), sorted`. Confidence resolves FIRST-SEEN by window
 * order, the same rule the span merge uses (`Spans.mergeWindowSpans`).
 *
 * Triplet column shape:
 *   STRUCT<subject STRUCT<start,end,label,prob>, relation STRING,
 *          obj STRUCT<start,end,label,prob>, conf DOUBLE>
 */
object Triplets {

  def triplet(subject: Column, relation: Column, obj: Column, conf: Column): Column =
    struct(subject.as("subject"), relation.cast("string").as("relation"),
      obj.as("obj"), conf.cast("double").as("conf"))

  /**
   * A1 window→doc triplet merge: union every window's triplets (already in
   * doc coordinates), dedup identical (subject, relation, object) tuples
   * across overlap zones keeping the first-seen confidence, sort by
   * (subject.start, subject.end, relation, obj.start). Two map-side
   * combinable aggregations — the mirror of `Spans.mergeWindowSpans`.
   *
   * Input: one row per window with (docCol, offCol, tripletsCol).
   * Output: (docCol, triplets) one row per doc.
   */
  def mergeWindowTriplets(windows: DataFrame, docCol: String = "doc_id",
                          offCol: String = "offset",
                          tripletsCol: String = "triplets"): DataFrame = {
    val ex = windows.select(col(docCol), col(offCol).as("_w_off"),
      explode(col(tripletsCol)).as("t"))
    ex.groupBy(col(docCol),
        col("t.subject.start").as("s_start"), col("t.subject.end").as("s_end"),
        col("t.subject.label").as("s_label"),
        col("t.relation").as("relation"),
        col("t.obj.start").as("o_start"), col("t.obj.end").as("o_end"),
        col("t.obj.label").as("o_label"))
      .agg(min_by(col("t.conf"), col("_w_off")).as("conf")) // first-seen by window order
      .groupBy(col(docCol))
      .agg(sort_array(collect_list(struct(
        col("s_start"), col("s_end"), col("s_label"), col("relation"),
        col("o_start"), col("o_end"), col("o_label"), col("conf")))).as("triplets"))
  }

  /**
   * A1 candidate-list merge (`manager.py:432-464` `_merge_candidates`): each
   * window carries a RANKED candidate list; the doc-level list concatenates
   * them in window order and drops later repeats (first-seen rank wins) —
   * `flatten` + `array_distinct`, which preserves first-occurrence order.
   *
   * Input: one row per window with (docCol, offCol, candsCol ARRAY<STRING>).
   * Output: (docCol, candidates) one row per doc.
   */
  def mergeWindowCandidates(windows: DataFrame, docCol: String = "doc_id",
                            offCol: String = "offset",
                            candsCol: String = "cands"): DataFrame = {
    windows
      .groupBy(col(docCol))
      .agg(sort_array(collect_list(struct(col(offCol).as("off"), col(candsCol).as("c"))))
        .as("ws"))
      .select(col(docCol),
        array_distinct(flatten(transform(col("ws"), w => w.getField("c"))))
          .as("candidates"))
  }
}
