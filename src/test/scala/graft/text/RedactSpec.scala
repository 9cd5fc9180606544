package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII redaction: planted-PII recall, clean-text precision, idempotency. */
class RedactSpec extends SparkSpec {

  private def one(text: String): org.apache.spark.sql.Row = {
    import spark.implicits._
    Redact.redact(Seq(text).toDF("text")).collect().head
  }

  test("plants are scrubbed and counted; clean prose untouched") {
    val r = one("Write to bob.smith+x@mail.example.org or 192.168.0.1, " +
      "call 212-555-0198 or 646.555.0100.")
    assert(r.getAs[Int]("n_emails") == 1)
    assert(r.getAs[Int]("n_ips") == 1)
    assert(r.getAs[Int]("n_phones") == 2)
    assert(r.getAs[String]("text_redacted") ==
      "Write to <EMAIL> or <IP>, call <PHONE> or <PHONE>.")

    val clean = one("the quick brown fox, version two, at noon")
    assert(clean.getAs[Int]("n_emails") == 0 && clean.getAs[Int]("n_ips") == 0
      && clean.getAs[Int]("n_phones") == 0)
    assert(clean.getAs[String]("text_redacted") == clean.getAs[String]("text"))
  }

  test("lane disjointness: IP-host emails, 3-group quads, long digit runs") {
    // user@1.2.3.4 is NOT an email (alpha TLD required) — the IP lane takes it
    val ipHost = one("mail user@1.2.3.4 now")
    assert(ipHost.getAs[Int]("n_emails") == 0 && ipHost.getAs[Int]("n_ips") == 1)
    assert(ipHost.getAs[String]("text_redacted") == "mail user@<IP> now")
    // 123.456.7890 is a phone (3 groups), never an IP (needs 4)
    val ph = one("fax 123.456.7890 ok")
    assert(ph.getAs[Int]("n_ips") == 0 && ph.getAs[Int]("n_phones") == 1)
    // word boundary: digits embedded in longer runs don't fire
    val run = one("id 91921925550100 and 1.2.3.45678")
    assert(run.getAs[Int]("n_ips") == 0 && run.getAs[Int]("n_phones") == 0)
  }

  test("idempotent and repartition-invariant over a planted corpus") {
    import spark.implicits._
    val docs = (0 until 300).map { i =>
      (i.toLong, s"doc $i" +
        (if (i % 3 == 0) s" contact user$i@example.com" else "") +
        (if (i % 4 == 0) s" from 10.${i % 256}.0.${(i * 7) % 256}" else "") +
        (if (i % 5 == 0) f" call ${i % 800 + 100}-555-${i % 10000}%04d" else ""))
    }.toDF("doc_id", "text")
    val once = Redact.redact(docs)
    assert(once.filter(col("n_emails") > 0).count() == 100)
    // second pass finds nothing (tokens carry no digits/@) and changes nothing
    val twice = Redact.redact(once.select("doc_id", "text_redacted"),
      "text_redacted", "re2")
    assert(twice.filter(col("re2") =!= col("text_redacted")).count() == 0)
    assert(twice.filter(col("n_emails") + col("n_ips") + col("n_phones") > 0)
      .count() == 0)
    // pure projection: partitioning cannot change any row
    val re = Redact.redact(docs.repartition(7)).select("doc_id", "text_redacted")
    assert(once.select("doc_id", "text_redacted").exceptAll(re).count() == 0)
  }
}
