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
