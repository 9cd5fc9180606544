package graft.block

import graft.SparkSpec
import graft.ingest.CorpusGen
import org.apache.spark.sql.functions._

/**
 * Skew fixtures (FIXTURES.md §6): hot blocking keys must not produce O(n²)
 * pairs — the sorted-neighborhood / purge path bounds every block's output.
 */
class SkewSpec extends SparkSpec {

  test("hot key produces O(n·w) pairs, not O(n²)") {
    import spark.implicits._
    // one pathological block: 500 members under a single key + some normal blocks
    val hot = (0 until 500).map(i => (77L, f"h$i%04d", f"mention $i%04d"))
    val normal = (0 until 60).map(i => ((i % 20).toLong + 1000L, f"n$i%04d", s"m $i"))
    val blocks = (hot ++ normal).toDF("key", "url", "mention")
    val cfg = Blocking.Config(maxBlock = 64, snWindow = 8, purgeLimit = 100000)
    val pairs = Blocking.candidatePairs(blocks, cfg)
    val n = pairs.count()
    // hot block: ≤ 500*8 SN pairs; naive would be 124750
    assert(n < 500L * 8 + 200, s"pair explosion: $n")
    assert(n > 400, s"hot block must still produce neighbor pairs: $n")
  }

  test("oversized blocks are purged entirely") {
    import spark.implicits._
    val giant = (0 until 300).map(i => (1L, f"g$i%04d", s"m"))
    val blocks = giant.toDF("key", "url", "mention")
    val cfg = Blocking.Config(maxBlock = 16, purgeLimit = 100, snWindow = 4)
    assert(Blocking.candidatePairs(blocks, cfg).count() == 0)
  }

  test("zipf domain skew: lineage skew factor stays bounded after hash partitioning") {
    import spark.implicits._
    val pages = CorpusGen.pages(spark, 2000L, seed = 42L, partitions = 8).cache()
    // head domain holds a large share of rows (the skew fixture is real)
    val byDomain = pages.toDF()
      .groupBy(regexp_extract(col("url"), "https://([^/]+)/", 1).as("domain")).count()
    val top = byDomain.orderBy(col("count").desc).first().getLong(1)
    assert(top > 2000L / 101 * 5, s"zipf head domain should dominate: $top")

    // but candidate pairs, hash-partitioned, stay balanced across partitions
    val cfg = Blocking.Config()
    val pairs = Blocking.candidatePairs(
      Blocking.blockKeys(Blocking.features(pages, cfg), cfg), cfg)
      .repartition(8, col("url_a"))
    val parts = graft.ops.Lineage.partitionCounts(pairs)
    val rows = parts.map(_._2).sum.toDouble
    val skew = parts.map(_._2).max * parts.length / rows
    assert(skew < 1.5, s"pair partitions skew factor $skew")
    pages.unpersist()
  }
}
