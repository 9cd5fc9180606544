package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text windowing (SURVEY.md §2.2 P3/P5) and the inverse document merge
 * (§2.5 A1) — the reference's window machinery re-expressed as pure column
 * algebra:
 *
 *  - `splitTokens` mirrors `relik/inference/data/splitters/
 *    window_based_splitter.py:34-66`: slide a `size`-token window with
 *    `stride`; the LAST window is right-aligned (back-off `i -= overflowing`,
 *    lines 56-60) so no window is shorter than `size` unless the doc is;
 *    stride == size degenerates to tumbling windows.
 *  - `mergeWindows` mirrors `relik/inference/data/window/manager.py:213-303`
 *    (`_merge_tokens` suffix/prefix overlap): re-assemble per-document token
 *    sequences from (possibly overlapping) windows by dropping each window's
 *    overlap with its predecessor — expressed as a sort + aggregate fold, no
 *    UDAF object needed (the fold IS the typed Aggregator semantics).
 */
object Windows {

  /**
   * tokens ARRAY<STRING> -> ARRAY<STRUCT<offset INT, window ARRAY<STRING>>>
   * Right-aligned-last-window semantics of the reference.
   */
  def windowStarts(nTokens: Column, winSize: Int, stride: Int): Column = {
    // starts: 0, stride, 2*stride, ..., with the final start clamped to
    // n - size (right alignment); single window when n <= size
    val lastStart = greatest(nTokens - winSize, lit(0))
    val regular = sequence(lit(0), lastStart, lit(stride))
    // if the regular sequence misses the clamped last start, append it
    when(nTokens <= winSize, array(lit(0)))
      .otherwise(
        when(element_at(regular, -1) === lastStart, regular)
          .otherwise(concat(regular, array(lastStart))))
  }

  /** Explode a token-array column into (offset, window) rows. */
  def splitTokens(df: DataFrame, tokensCol: String, winSize: Int, stride: Int): DataFrame = {
    df.withColumn("offset",
        explode(windowStarts(size(col(tokensCol)), winSize, stride)))
      .withColumn("window", slice(col(tokensCol), col("offset") + 1, lit(winSize)))
  }

  /**
   * `chunked` helper (P2 max-length chunking, the reference's
   * `spacy_sentence_splitter.py:114-128`): partition an array column into
   * consecutive chunks of ≤ n elements; empty arrays yield no chunks.
   * Pure column algebra — composes with `split_sentences` for the
   * reference's "split overlong sentence lists" path.
   */
  def chunkedArray(arr: Column, n: Int): Column = {
    require(n > 0, s"chunk size must be positive, got $n")
    when(size(arr) <= 0, array().cast("array<array<string>>"))
      .otherwise(transform(
        sequence(lit(0), ((size(arr) - 1) / n).cast("int")),
        i => slice(arr, i * n + 1, lit(n))))
  }

  /** 3-way windowing dispatch (the reference's `annotator.py:338-352`:
    * `window_size ∈ {none, sentence, int}` selects Blank / Spacy / Window
    * sentence splitters feeding `WindowManager.create_windows`). */
  sealed trait WindowMode
  object WindowMode {
    /** `window_size = "none"`: the whole document is one window. */
    case object NoSplit extends WindowMode
    /** `window_size = "sentence"`: one window per sentence
      * (`split_sentences` boundaries; sentences partition the text). */
    case object Sentence extends WindowMode
    /** integer `window_size`: sliding token window, right-aligned last
      * (`window_based_splitter.py:34-66`). */
    final case class Tokens(size: Int, stride: Int) extends WindowMode
  }

  /**
   * One entry point for all three window modes, producing the reference's
   * window sample shape in doc coordinates
   * (`manager.py:159-167`: window_id, char offset of the window's first
   * token, text slice `document[start:end]`):
   *
   *   (key, window_id INT, char_offset INT, window_text STRING)
   *
   * Pure column algebra in every branch — the explode fan-out is the only
   * row-count change, nothing shuffles, and the scan stays narrow (the text
   * column is consumed where it is read).
   */
  def createWindows(df: DataFrame, keyCol: String, textCol: String,
                    mode: WindowMode): DataFrame = {
    import graft.functions.GraftFunctions.{split_sentences, tokenize_offsets}
    val key = col(keyCol)
    mode match {
      case WindowMode.NoSplit =>
        df.select(key, lit(0).as("window_id"), lit(0).as("char_offset"),
          col(textCol).as("window_text"))

      case WindowMode.Sentence =>
        // sentences partition the text (concat == text), so each window's
        // char offset is the running sum of prior sentence lengths —
        // computed as a linear scanLeft, not a per-sentence re-slice
        val sents = split_sentences(col(textCol))
        df.select(key, sents.as("sents"))
          .withColumn("offs",
            aggregate(col("sents"), array(lit(0)),
              (acc, s) => concat(acc, array(element_at(acc, -1) + length(s)))))
          .select(key, col("offs"), posexplode(col("sents")))
          .select(key, col("pos").as("window_id"),
            element_at(col("offs"), col("pos") + 1).as("char_offset"),
            col("col").as("window_text"))

      case WindowMode.Tokens(winSize, winStride) =>
        // token windows with the right-aligned-last contract; the text
        // slice spans first-token start .. last-token end, exactly the
        // reference's `document[window_text_start:window_text_end]`
        val toks = tokenize_offsets(col(textCol))
        df.select(key, col(textCol).as("t"), toks.as("toks"))
          .filter(size(col("toks")) > 0)
          .select(key, col("t"), col("toks"),
            posexplode(windowStarts(size(col("toks")), winSize, winStride)).as(Seq("pos", "off")))
          .select(key, col("pos").as("window_id"),
            element_at(col("toks"), col("off") + 1).getField("idx").as("start"),
            element_at(col("toks"),
              least(col("off") + winSize, size(col("toks")))).getField("idx_end").as("end"),
            col("t"))
          .select(key, col("window_id"), col("start").as("char_offset"),
            substring(col("t"), col("start") + 1, col("end") - col("start")).as("window_text"))
    }
  }

  /**
   * Inverse of splitTokens for stride ≤ size: group windows per key, sort by
   * offset, fold with overlap-drop — each window contributes the slice past
   * the previous window's end (the reference's suffix/prefix merge,
   * `manager.py:266-303`, simplified by known offsets).
   */
  def mergeWindows(windows: DataFrame, keyCol: String): DataFrame = {
    val sorted = windows
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("offset"), col("window")))).as("ws"))
    // fold: acc tokens = acc ++ window.slice(accLen - offset)
    sorted.select(
      col(keyCol),
      aggregate(
        col("ws"),
        array().cast("array<string>"),
        (acc, w) => concat(acc,
          slice(w.getField("window"),
            size(acc) - w.getField("offset") + 1,
            size(w.getField("window"))))
      ).as("tokens"))
  }
}
