package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/**
 * Text-analysis operators for corpus preparation: language-ID (stopword
 * n-gram heuristic), quality scoring (length/punct/stopword ratios), token
 * counting (whitespace + subword-ish), and document fingerprinting. All are
 * narrow, codegen'd column expressions — no shuffle, no UDF closures —
 * so they run at scan speed over 100 TB.
 *
 * This family generalizes the reference's per-sample length filters and
 * discard counters (`/root/reference/relik/reader/data/relik_reader_data.py:
 * 759-841`) into corpus-quality features.
 */
object TextAnalysis {

  /** Function-word lists per language (tiny, frozen; heuristic lang-ID). */
  val STOPWORDS: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is", "was", "for", "on", "as", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein", "eine", "nicht"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "en", "es", "un", "una", "por", "con"),
    "fr" -> Seq("le", "la", "les", "de", "et", "en", "est", "un", "une", "pour", "dans", "que"))

  private def tokens(text: Column): Column = split(lower(text), "\\s+")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => lit(w)): _*)))

  /**
   * Heuristic language guess: most function-word hits wins; `und` (unknown)
   * when nothing matched. Deterministic tie-break by language code.
   */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = STOPWORDS.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(hits(toks, ws).as("hits"), lit(lang).as("lang"))
    }
    df.withColumn("lang_scores", array(scored: _*))
      .withColumn("best", array_max(col("lang_scores")))
      .withColumn("lang_guess",
        when(col("best.hits") > 0, col("best.lang")).otherwise(lit("und")))
      .withColumn("lang_hits", col("best.hits"))
      .drop("lang_scores", "best")
  }

  /**
   * Quality features: char/token counts, mean token length, alpha ratio,
   * punctuation ratio, stopword ratio, and a composite [0,1] quality score
   * (monotone in "looks like prose").
   */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nChars = length(t)
    val nToks = size(toks)
    val alpha = length(regexp_replace(t, "[^\\p{L}]", ""))
    val punct = length(regexp_replace(t, "[^.,;:!?]", ""))
    val stop = hits(toks, STOPWORDS("en"))
    df.withColumn("n_chars_q", nChars)
      .withColumn("n_tokens", nToks)
      .withColumn("mean_token_len",
        when(nToks > 0, (nChars - (nToks - 1)).cast("double") / nToks).otherwise(0.0))
      .withColumn("alpha_ratio", when(nChars > 0, alpha.cast("double") / nChars).otherwise(0.0))
      .withColumn("punct_ratio", when(nChars > 0, punct.cast("double") / nChars).otherwise(0.0))
      .withColumn("stopword_ratio", when(nToks > 0, stop.cast("double") / nToks).otherwise(0.0))
      .withColumn("quality",
        least(lit(1.0), greatest(lit(0.0),
          lit(0.3) * least(lit(1.0), col("n_tokens").cast("double") / 100) +
          lit(0.4) * col("alpha_ratio") +
          lit(0.3) * least(lit(1.0), col("stopword_ratio") * 5))))
  }

  /**
   * Token counting: whitespace tokens plus a BPE-ish subword estimate
   * (word-boundary pieces: runs of letters, digits, or single punctuation —
   * the standard pre-tokenizer regex shape).
   */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("ws_tokens", size(split(t, "\\s+")))
      .withColumn("subword_pieces",
        size(filter(split(t, "(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])"), p => length(p) > 0)))
      .withColumn("chars_per_ws_token",
        when(col("ws_tokens") > 0, length(t).cast("double") / col("ws_tokens")).otherwise(0.0))
  }

  /** Rolling-hash document fingerprint + normalized-content fingerprint. */
  def fingerprints(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("fp_raw", rolling_fingerprint(col(textCol)))
      .withColumn("fp_norm", rolling_fingerprint(normalize_text(col(textCol))))
}
