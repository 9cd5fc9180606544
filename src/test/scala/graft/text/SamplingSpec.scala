package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling + leakage-safe splits (training-data pipeline). */
class SamplingSpec extends SparkSpec {

  test("sample decision is a pure function of (key, salt): repartition-invariant") {
    import spark.implicits._
    val d1 = spark.range(0, 2000, 1, 2).select($"id".cast("long").as("k"))
    val d2 = spark.range(0, 2000, 1, 13).select($"id".cast("long").as("k"))
    val s1 = Sampling.deterministicSample(d1, "k", 0.3, "t").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(d2, "k", 0.3, "t").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "partitioning must not change the sample")
    // rate lands near 0.3 (md5 is uniform; 2000 draws)
    assert(math.abs(s1.size / 2000.0 - 0.3) < 0.04, s"rate ${s1.size / 2000.0}")
    // md5-prefix semantics match java's MessageDigest exactly (engine parity)
    val md = java.security.MessageDigest.getInstance("MD5")
    val manual = (0L until 2000L).filter { k =>
      val hex = md.digest(s"${k}t".getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.substring(0, 8) < "4ccccccc" // 0.3 * 2^32 = 1288490188 = 0x4ccccccc
    }.toSet
    assert(s1 == manual)
  }

  test("domainQuota: exactly top-k per domain by (score desc, key asc), repartition-invariant") {
    import spark.implicits._
    // 10 domains × 40 docs, scores with ties so the key tiebreak matters
    val d = (0 until 400).map { i =>
      (i.toLong, s"https://www.site${i % 10}.com/p/$i", (i % 7).toLong)
    }.toDF("doc_id", "url", "sc")
    val rows = Sampling.domainQuota(d, "doc_id", col("sc"), k = 3)
      .select("domain", "quota_rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.groupBy(_._1).values.forall(_.length == 3), "k rows per domain")
    // equals the naive per-domain sort-take
    val naive = d.withColumn("domain", Urls.registrableDomain(Urls.host($"url")))
      .select("domain", "doc_id", "sc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (dom, rs) =>
        dom -> rs.sortBy(t => (-t._3, t._2)).take(3).map(_._2).toSeq }
    val got = rows.groupBy(_._1).map { case (dom, rs) =>
      dom -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(got == naive, "window formulation must equal naive top-k")
    // unique total order ⇒ identical kept set under any partitioning
    val re = Sampling.domainQuota(d.repartition(13), "doc_id", col("sc"), k = 3)
      .select("domain", "quota_rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(re == rows.toSet)
  }

  test("groupSplit: whole group in one split, weights respected") {
    import spark.implicits._
    val d = spark.range(0, 5000).select(
      $"id".as("doc"), concat(lit("g"), ($"id" % 500).cast("string")).as("grp"))
    val sp = Sampling.groupSplit(d, "grp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s")
    val leaks = sp.groupBy($"grp").agg(countDistinct($"split").as("k"))
      .filter($"k" > 1).count()
    assert(leaks == 0, "a group must never straddle splits")
    val byueSplit = sp.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byueSplit.keySet == Set("train", "val", "test"))
    assert(byueSplit("train") > byueSplit("val") && byueSplit("train") > byueSplit("test"))
    assert(math.abs(byueSplit("train") / 5000.0 - 0.8) < 0.06)
  }

  test("weightedSample: clamped, monotone in weight, rate tracks weight, repartition-invariant") {
    import spark.implicits._
    val df = (0 until 4000).map(i => (i.toLong, (i % 100) / 100.0)).toDF("id", "w")
    def kept(weight: org.apache.spark.sql.Column): Set[Long] =
      Sampling.weightedSample(df, "id", weight).select("id")
        .collect().map(_.getLong(0)).toSet
    assert(kept(lit(0.0)).isEmpty && kept(lit(-3.0)).isEmpty)
    assert(kept(lit(1.0)).size == 4000 && kept(lit(7.0)).size == 4000)
    // monotone: halving every weight can only shrink the sample
    val full = kept($"w"); val half = kept($"w" * 0.5)
    assert(half.subsetOf(full) && half.size < full.size)
    // acceptance rate ≈ mean weight (0.495 here)
    assert(math.abs(full.size / 4000.0 - 0.495) < 0.03)
    // pure per-row decision: repartitioning changes nothing
    val reKept = Sampling.weightedSample(df.repartition(17), "id", $"w")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(reKept == full)
  }
}
