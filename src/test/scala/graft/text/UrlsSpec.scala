package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization, host extraction, registrable-domain heuristic. */
class UrlsSpec extends SparkSpec {

  private def keys(url: String): (String, String, String) = {
    import spark.implicits._
    val r = Urls.urlKeys(Seq(url).toDF("url")).collect().head
    (r.getAs[String]("url_canon"), r.getAs[String]("host"), r.getAs[String]("domain"))
  }

  test("canonicalization rules fire exactly as documented") {
    // case, www, default port, fragment, tracking params, empty path
    assert(keys("HTTPS://WWW.Example.COM:443?utm_source=a&id=7#frag") ==
      ("https://example.com/?id=7", "www.example.com", "example.com"))
    // userinfo stripped; non-default port KEPT in canonical, not in host
    assert(keys("http://bob@site.org:8080/a/b?x=1") ==
      ("http://site.org:8080/a/b?x=1", "site.org", "site.org"))
    // tracking-only query drops the '?' entirely; mid-string utm removed
    assert(keys("http://a.net/p?id=3&utm_medium=z&q=4") ==
      ("http://a.net/p?id=3&q=4", "a.net", "a.net"))
    // href= is NOT the ref lane (param-start anchor)
    assert(keys("http://a.net/p?href=x")._1 == "http://a.net/p?href=x")
    // non-URL strings pass through unchanged
    assert(keys("not a url")._1 == "not a url")
  }

  test("registrable domain: eTLD+1 with ccSLD lane") {
    assert(keys("http://blog.news.site3.co.uk/x")._3 == "site3.co.uk")
    assert(keys("http://site3.co.uk/x")._3 == "site3.co.uk")
    assert(keys("http://a.b.c.example.org/x")._3 == "example.org")
    assert(keys("http://localhost/x")._3 == "localhost")
  }

  test("domainStats: shares sum to 1, hosts counted distinct, 1-row build side") {
    import spark.implicits._
    val urls = (0 until 1200).map(i =>
      s"http://h${i % 7}.dom${i % 3}.com/p/$i").toDF("url")
    val stats = Urls.domainStats(urls).collect()
    assert(stats.length == 3)
    assert(math.abs(stats.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    assert(stats.forall(_.getAs[Long]("n_hosts") == 7))
    assert(stats.map(_.getAs[Long]("n_docs")).sum == 1200)
  }

  test("latestRevision: latest warc_ts wins per canonical url, no window in the plan") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // three fetches of one page under canonically-equal urls + one other page
    val docs = Seq(
      (1L, "HTTPS://WWW.News.COM:443/a?utm_source=x", ts(100)),
      (2L, "https://news.com/a#frag", ts(300)),
      (3L, "https://news.com/a", ts(200)),
      (4L, "https://other.org/b", ts(50))
    ).toDF("doc_id", "url", "warc_ts")
    val out = Urls.latestRevision(docs)
    val rows = out.collect().map(r => r.getAs[String]("url_canon") ->
      ((r.getAs[Long]("doc_id"), r.getAs[Long]("n_revisions")))).toMap
    assert(rows.size == 2)
    assert(rows("https://news.com/a") == ((2L, 3L)))      // max ts = 300
    assert(rows("https://other.org/b") == ((4L, 1L)))
    // payload of the WINNING row rides through intact
    val win = out.filter($"url_canon" === "https://news.com/a").collect().head
    assert(win.getAs[Timestamp]("warc_ts") == ts(300))
    // partial-aggregable shape: no WindowExec anywhere in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("latestRevision: warc_ts ties break on the raw url, partition-invariant") {
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = new Timestamp(1000L)
    val docs = Seq(
      (1L, "https://tie.com/p#a", t0),
      (2L, "https://tie.com/p#b", t0),
      (3L, "https://tie.com/p", t0)
    ).toDF("doc_id", "url", "warc_ts")
    val a = Urls.latestRevision(docs.repartition(1)).collect().head
    val b = Urls.latestRevision(docs.repartition(7)).collect().head
    // max raw url = "https://tie.com/p#b" → doc 2, under any partitioning
    assert(a.getAs[Long]("doc_id") == 2L && b.getAs[Long]("doc_id") == 2L)
    assert(a.getAs[Long]("n_revisions") == 3L)
  }
}
