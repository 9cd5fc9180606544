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
}
