package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy cat again and again today"), // near dup of 0
      (3L, "completely different content about spark catalyst optimizer rules"),
      (4L, "completely different content about spark catalyst optimizer rules"), // exact dup of 3
      (5L, "unrelated text mentioning gardens rivers mountains and deserts"))
    base.toDF("doc_id", "text")
  }

  test("exact dedup keeps one representative per content group") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 2L, 3L, 5L))
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(groups.map(_.getAs[Long]("n_dups")).sum == 6)
  }

  test("minhash near-dup groups exact and near duplicates") {
    val groups = minhashGroups()
    assert(groups(0L) == groups(1L), "exact dups grouped")
    assert(groups(0L) == groups(2L), "near dups grouped")
    assert(groups(3L) == groups(4L))
    assert(groups(0L) != groups(3L))
    assert(groups(5L) != groups(0L) && groups(5L) != groups(3L))
  }

  private def minhashGroups(): Map[Long, String] =
    Dedup.minhashNearDupGroups(docs, "doc_id", "text",
        Dedup.MinHashConfig(verifyJaccard = 0.5))
      .collect().map(r => r.getAs[String]("doc_id").toLong -> r.getAs[String]("group_id")).toMap

  test("simhash pairs detect planted near-dups") {
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
        Dedup.SimHashConfig(maxHamming = 8))
      .collect().map(r => (r.getAs[String]("id_a").toLong, r.getAs[String]("id_b").toLong)).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((3L, 4L)))
  }

  test("ngram jaccard exact values") {
    import spark.implicits._
    val d = Seq((0L, "a b c d"), (1L, "a b c e"), (2L, "x y z w")).toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(d, "doc_id", "text", 1, (a, b) => b === a + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out((0L, 1L)) - 3.0 / 5.0) < 1e-12)
    assert(out((1L, 2L)) == 0.0)
  }

  test("embedding near-dup via SRP-LSH finds planted duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val base = Seq.tabulate(50)(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val dups = base.take(5).map { case (i, v) => (i + 1000L, v.clone()) }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
        Dedup.EmbeddingConfig(bands = 12, bits = 8, minCosine = 0.999))
      .collect().map(r => (r.getAs[String]("id_a"), r.getAs[String]("id_b"))).toSet
    for (i <- 0 until 5) {
      val hit = pairs.contains((s"$i", s"${i + 1000}")) ||
        pairs.contains((s"${i + 1000}", s"$i"))
      assert(hit, s"missing dup pair $i")
    }
  }
}
