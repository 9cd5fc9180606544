package graft.spans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.tokenize_offsets

/**
 * Span/annotation layer (SURVEY.md §1.1, §2.5 A1): the Spark-native data
 * model for "entity X at chars/tokens [a,b) of doc Y" — the reference's
 * output currency (`/root/reference/relik/inference/data/objects.py:55-66`
 * `Span(start, end, label, text)`), plus the operators that move spans
 * between coordinate systems and merge per-window annotations back to
 * document level.
 *
 * Everything is columnar: spans are `ARRAY<STRUCT<start,end,label,prob>>`
 * columns, conversions are codegen'd higher-order functions over the token
 * array, and the window→doc merge is two map-side-combined aggregations —
 * no per-row driver logic anywhere, so the layer runs at scan speed over
 * a web-scale corpus.
 */
object Spans {

  /** Column type of one span annotation. */
  def span(start: Column, end: Column, label: Column, prob: Column): Column =
    struct(start.cast("int").as("start"), end.cast("int").as("end"),
      label.cast("string").as("label"), prob.cast("double").as("prob"))

  /**
   * A1 window→doc span merge (`manager.py:343-430`): union every window's
   * spans, dedup identical (start, end, label) annotations across
   * overlapping windows, resolve the probability conflict FIRST-SEEN by
   * window order (the reference iterates windows left-to-right and keeps
   * the first probability it sees), and emit doc-level spans sorted by
   * start offset.
   *
   * Input: one row per window with (docCol, offCol, spansCol) where spans
   * are already in DOC coordinates. Two aggregations, both map-side
   * combinable; the span key join never materializes a window's full span
   * set in one task.
   */
  def mergeWindowSpans(windows: DataFrame, docCol: String = "doc_id",
                       offCol: String = "offset", spansCol: String = "spans"): DataFrame = {
    val ex = windows.select(col(docCol), col(offCol).as("_w_off"), explode(col(spansCol)).as("s"))
    ex.groupBy(col(docCol),
        col("s.start").as("start"), col("s.end").as("end"), col("s.label").as("label"))
      .agg(min_by(col("s.prob"), col("_w_off")).as("prob")) // first-seen by window order
      .groupBy(col(docCol))
      .agg(sort_array(collect_list(
        struct(col("start"), col("end"), col("label"), col("prob")))).as("spans"))
  }

  /**
   * P10 whitespace snap (`cli/data.py:127-140`): shrink a char span so it
   * starts and ends on non-space characters — the reference walks
   * `while text[end-1] == ' ': end -= 1` and
   * `while text[start] == ' ': start += 1` (plain spaces only). Expressed
   * as two regexp probes on the span's flanks; returns struct(start, end).
   */
  def shrinkSpanWhitespace(text: Column, startChar: Column, endChar: Column): Column = {
    val leading = length(regexp_extract(substring(text, startChar + 1, endChar - startChar), "^( *)", 1))
    val trailing = length(regexp_extract(substring(text, startChar + 1, endChar - startChar), "( *)$", 1))
    struct(
      (startChar + leading).as("start"),
      (endChar - trailing).as("end"))
  }

  /**
   * Char→token span conversion with the reference's two-step rule
   * (`cli/data.py:158-206`): exact boundary match first (span start equals
   * a token start, span end equals a token end), else SNAP to the token
   * whose [idx, idx_end] range contains the boundary. Returns NULL struct
   * fields when no token matches (span outside the text).
   *
   * `tokens` is the `tokenize_offsets` array; end token is EXCLUSIVE
   * (reference emits token_id + 1).
   */
  def charSpanToTokenSpan(tokens: Column, startChar: Column, endChar: Column): Column = {
    def firstI(pred: Column => Column): Column =
      try_element_at(filter(tokens, t => pred(t)), lit(1)) // NULL when no token matches
    val exactS = firstI(t => t.getField("idx") === startChar)
    val exactE = firstI(t => t.getField("idx_end") === endChar)
    val snapS = firstI(t => t.getField("idx") <= startChar && startChar <= t.getField("idx_end"))
    val snapE = firstI(t => t.getField("idx") <= endChar && endChar <= t.getField("idx_end"))
    struct(
      coalesce(exactS.getField("i"), snapS.getField("i")).as("ts"),
      (coalesce(exactE.getField("i"), snapE.getField("i")) + 1).as("te"))
  }

  /**
   * Token→char span conversion (`manager.py:78-116`): char start = start
   * token's idx; char end = (te-1) token's idx_end. `te` exclusive.
   */
  def tokenSpanToCharSpan(tokens: Column, ts: Column, te: Column): Column =
    struct(
      try_element_at(tokens, ts + 1).getField("idx").as("start_char"),
      try_element_at(tokens, te).getField("idx_end").as("end_char"))

  /**
   * Tokenize a document table once and attach both coordinate systems for
   * a char-span column: (ts, te) token span + snapped (start_char,
   * end_char) — the round-trip the reference does per query
   * (char annotations in, token tensors through the reader, char spans out).
   */
  def withTokenSpans(df: DataFrame, textCol: String,
                     startChar: Column, endChar: Column): DataFrame = {
    val withToks = df.withColumn("_toks", tokenize_offsets(col(textCol)))
    withToks
      .withColumn("_tspan", charSpanToTokenSpan(col("_toks"), startChar, endChar))
      .withColumn("ts", col("_tspan.ts"))
      .withColumn("te", col("_tspan.te"))
      .withColumn("_cspan",
        tokenSpanToCharSpan(col("_toks"), col("ts"), col("te")))
      .withColumn("snap_start", col("_cspan.start_char"))
      .withColumn("snap_end", col("_cspan.end_char"))
      .drop("_tspan", "_cspan")
  }
}
