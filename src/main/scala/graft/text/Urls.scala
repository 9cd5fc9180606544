package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL canonicalization and host/domain analytics for a Common-Crawl-shaped
 * corpus. The reference keys documents by opaque ids; at web scale the url
 * IS the document identity (the corpus contract in BASELINE.json carries a
 * `url` column), and three derived keys matter:
 *
 *  - the CANONICAL url (dedup identity across trivially-different fetches:
 *    scheme/host case, default ports, `www.`, fragments, tracking params),
 *  - the HOST (per-site grouping),
 *  - the REGISTRABLE DOMAIN (eTLD+1 heuristic — the unit of head-domain
 *    skew that the blocking layer salts on, `block/Blocking.scala`).
 *
 * All pure per-row regexp/array expressions in the common Java-regex ∩ RE2
 * subset — codegen'd, no UDF, no shuffle, and bit-exact replayable by the
 * DuckDB oracle. Canonicalization rules (each is a documented choice, not
 * RFC 3986 normalization): lowercase scheme+host, strip userinfo, strip
 * ports 80/443 regardless of scheme, strip one leading `www.`, drop the
 * fragment, drop tracking query params ([[TRACKING]]), empty path → `/`.
 * Non-URL strings (no `scheme://`) pass through unchanged.
 */
object Urls {

  /** Tracking query params dropped by canonicalization (anchored to a
    * param start, so `href=` never matches the `ref` lane). */
  val TRACKING = "(^|&)(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref)=[^&]*"

  private val SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  private val PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
  private val QUERY_RE = "^[^#?]*\\?([^#]*)"

  /** Lowercased host (userinfo and any port stripped). */
  def host(u: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(u, HOSTPORT_RE, 1)), "^[^/@]*@", ""),
      ":\\d+$", "")

  /**
   * Registrable-domain heuristic (eTLD+1 without the public-suffix list,
   * which is a moving external artifact): take the last two labels, or the
   * last three when the second-level label is a known country-code
   * second-level (`co.uk`-style: 2-letter TLD + co/com/net/org/gov/ac/edu).
   */
  def registrableDomain(hostCol: Column): Column = {
    val labs = split(hostCol, "\\.")
    val n = size(labs)
    val take3 = n >= 3 &&
      element_at(labs, -2).isin("co", "com", "net", "org", "gov", "ac", "edu") &&
      length(element_at(labs, -1)) === 2
    val k = when(take3, lit(3)).otherwise(lit(2))
    when(n <= k, hostCol).otherwise(array_join(slice(labs, n - k + 1, k), "."))
  }

  /** Canonical url per the rules in the object doc. */
  def canonicalize(u: Column): Column = {
    val scheme = lower(regexp_extract(u, SCHEME_RE, 1))
    val hp = regexp_replace(
      regexp_replace(lower(regexp_extract(u, HOSTPORT_RE, 1)), "^[^/@]*@", ""),
      ":(80|443)$", "")
    val hpNoWww = regexp_replace(hp, "^www\\.", "")
    val path = regexp_extract(u, PATH_RE, 1)
    val q = regexp_extract(u, QUERY_RE, 1)
    val cq = regexp_replace(regexp_replace(q, TRACKING, ""), "^&", "")
    when(scheme === "", u).otherwise(concat(
      scheme, lit("://"), hpNoWww,
      when(path === "", lit("/")).otherwise(path),
      when(cq === "", lit("")).otherwise(concat(lit("?"), cq))))
  }

  /** doc_id → (url_canon, host, domain) projection over a url column. */
  def urlKeys(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val h = host(col(urlCol))
    df.withColumn("url_canon", canonicalize(col(urlCol)))
      .withColumn("host", h)
      .withColumn("domain", registrableDomain(h))
  }

  /**
   * Revisit dedup: keep the LATEST fetch per canonical url — the first
   * stage of any Common-Crawl-style pipeline (the same page is re-crawled
   * across snapshots; the corpus contract keys rows by `(url, warc_ts)`).
   * Output = the winning row's full payload plus `url_canon` and
   * `n_revisions` (how many fetches collapsed into it).
   *
   * Scale shape: ONE shuffle on the canonical url with a map-side-combined
   * `max_by(struct(payload), struct(ts, url))` — each partition keeps a
   * single candidate row per key before the exchange, so revisit-heavy
   * corpora (the common case: head pages re-crawled per snapshot) shrink
   * BEFORE they shuffle. Deliberately not a `row_number() over (partition
   * by url_canon order by ts desc)` window: WindowExec buffers whole
   * groups per task and combines nothing map-side (BASELINE.md lesson 5).
   * Ties on `warc_ts` break on the raw url, so the result is deterministic
   * under any partitioning.
   */
  def latestRevision(df: DataFrame, urlCol: String = "url",
                     tsCol: String = "warc_ts"): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    df.withColumn("url_canon", canonicalize(col(urlCol)))
      .groupBy("url_canon")
      .agg(
        max_by(payload, struct(col(tsCol), col(urlCol))).as("_row"),
        count(lit(1)).as("n_revisions"))
      .select(col("url_canon") +:
        df.columns.map(c => col(s"_row.$c").as(c)) :+ col("n_revisions"): _*)
  }

  /**
   * Head-domain skew profile: docs and distinct hosts per registrable
   * domain, plus each domain's corpus share. One partial-aggregable
   * groupBy; the share join is against the tiny aggregate, not the corpus.
   * This is the table the blocking layer's salting policy reads at 100 TB
   * (which domains exceed the hot-block threshold).
   */
  def domainStats(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val perDomain = urlKeys(df, urlCol).groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("host")).as("n_hosts"))
    // share against a 1-row broadcast total (re-aggregated from the tiny
    // per-domain table — one corpus scan, no whole-partition window)
    val total = perDomain.agg(sum(col("n_docs")).as("tot"))
    perDomain.crossJoin(broadcast(total))
      .withColumn("share", col("n_docs") / col("tot"))
      .drop("tot")
  }
}
