package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

/**
 * Exact-by-construction Bloom pre-pruning — the shared shape behind
 * [[graft.dedup.Dedup.incrementalExact]] (batch content keys vs frozen
 * corpus) and [[graft.pipeline.ErPipeline.incremental]] (batch block keys
 * vs corpus block table): aggregate a Bloom filter over the SMALL side's
 * key set (Catalyst's partial-aggregable `BloomFilterAggregate` — one
 * per-partition bloom, OR-merged, no row leaves its partition), then
 * filter the BIG side's scan with `BloomFilterMightContain` against the
 * scalar-subquery bloom. No false negatives, so dropping non-matches is
 * EXACT whenever downstream logic re-checks membership precisely (an
 * anti-join, a touched-count filter); false positives only add bytes.
 *
 * Sizing: bits = -n·ln(fpp)/ln²2, optimal for n = `expectedRows`. A row
 * count is a valid (over-)estimate of the key NDV — realized fpp lands at
 * or below target. Regime bound: the bloom must fit a broadcast (10^8 keys
 * at fpp 1e-4 ≈ 240 MB); an increment whose key set outgrows that belongs
 * on a bucketed corpus artifact ([[graft.sources.BucketedStore]] — the big
 * side pre-shuffled by key at write time) instead of a runtime filter.
 */
object BloomPrune {

  /** Predicate: `probe` (hashed with xxhash64, same lane as the build side)
    * might appear in `keys(keyCol)`'s value set. */
  def mightContain(keys: DataFrame, keyCol: String, probe: Column,
                   expectedRows: Long, fpp: Double = 1e-4): Column = {
    require(expectedRows > 0, s"expectedRows must be > 0, got $expectedRows")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val ln2sq = math.log(2) * math.log(2)
    val nBits = math.max(64L,
      math.ceil(-expectedRows.toDouble * math.log(fpp) / ln2sq).toLong)
    val bloom = keys.select(column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        expression(xxhash64(col(keyCol))),
        expression(lit(expectedRows)), expression(lit(nBits)))
        .toAggregateExpression()).as("bloom"))
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      expression(bloom.scalar()), expression(xxhash64(probe))))
  }
}
