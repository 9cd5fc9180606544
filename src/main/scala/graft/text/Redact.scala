package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII redaction for web-text corpus preparation: scrub email addresses,
 * IPv4 addresses, and phone numbers from a text column, keeping per-row
 * counts of what was removed. This is the standard pre-training scrub step
 * (Dolma, ROOTS, CCNet all carry one); the reference pipeline ingests
 * already-clean corpora, so this extends its data layer the way a
 * Common-Crawl-scale deployment needs.
 *
 * Everything is a codegen'd per-row `regexp_count`/`regexp_replace` chain —
 * no shuffle, no UDF, runs at scan speed over 100 TB. Patterns are written
 * in the common subset of Java regex (Spark) and RE2 (DuckDB/oracle), so the
 * whole operator replays bit-exactly cross-engine: counts are taken on the
 * ORIGINAL text, replacements apply in the fixed order email → IP → phone.
 *
 * Redaction is idempotent: the replacement tokens contain no digits or `@`,
 * so they can never re-match any pattern (RedactSpec asserts this).
 */
object Redact {

  /** RFC-casual email: local part, `@`, dotted host with an alpha TLD.
    * The alpha-TLD requirement keeps `user@1.2.3.4` out of the email lane
    * (its host is counted by [[IPV4]] instead). */
  val EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so it never fires inside longer digit
    * runs. Deliberately permissive (no 0-255 octet check): for redaction,
    * over-matching "999.1.1.1" is harmless; under-matching leaks PII. */
  val IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style phone: 3-3-4 digit groups with `-` or `.` separators.
    * Cannot collide with [[IPV4]] (an IP needs four dot-separated groups,
    * a phone exactly three) — RedactSpec pins this disjointness. */
  val PHONE = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  val EMAIL_TOKEN = "<EMAIL>"
  val IP_TOKEN    = "<IP>"
  val PHONE_TOKEN = "<PHONE>"

  /** The redacted text column alone (counts on the original, order-fixed
    * replacement chain), for callers composing their own projection. */
  def redactedText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EMAIL, EMAIL_TOKEN),
        IPV4, IP_TOKEN),
      PHONE, PHONE_TOKEN)

  /**
   * Append `n_emails`, `n_ips`, `n_phones` (match counts on the original
   * text) and `outCol` (the scrubbed text). Pure per-row projection.
   */
  def redact(df: DataFrame, textCol: String = "text",
             outCol: String = "text_redacted"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EMAIL)))
      .withColumn("n_ips", regexp_count(t, lit(IPV4)))
      .withColumn("n_phones", regexp_count(t, lit(PHONE)))
      .withColumn(outCol, redactedText(t))
  }
}
