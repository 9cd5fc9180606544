package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed table store: persist a table pre-partitioned AND pre-sorted by
 * its join key so every later join/aggregation on that key is co-located —
 * the "reuse a partitioning across stages" lever at 100 TB.
 *
 * Why this matters at scale: the ER corpus/feature table is written once
 * but joined MANY times — candidate-pair attach (twice per run), incremental
 * re-runs ([[graft.dedup.Dedup.incrementalExact]],
 * [[graft.cluster.ConnectedComponents.incremental]]), online assignment
 * ([[graft.streaming.EntityAssign]]). An unbucketed parquet table pays a
 * full shuffle of the BIG side on every one of those joins; a table bucketed
 * by the id key pays the shuffle once at write time, and every subsequent
 * equi-join or groupBy on that key reads co-located buckets with NO
 * Exchange on the bucketed side (Catalyst's `outputPartitioning` for a
 * bucketed scan is `HashPartitioning(key, buckets)`, which satisfies the
 * join's distribution requirement). Two tables bucketed the same way join
 * with no shuffle AT ALL — asserted structurally in BucketedStoreSpec.
 *
 * This is the Spark-native analog of the reference persisting its document
 * index keyed by passage id for repeated retrieval
 * (`/root/reference/relik/retriever/indexers/base.py:61-88`): key the
 * storage by the lookup key once, amortize forever.
 *
 * Bucket-count sizing at 10^12 rows: buckets are fixed at write time and
 * every reader sees at most `buckets`-way parallelism on bucketed scans
 * unless `spark.sql.sources.bucketing.autoBucketedScan.enabled` lets the
 * planner fall back; size buckets ≈ data_bytes / 256 MB (tens of thousands
 * at 100 TB), NOT to today's core count.
 *
 * Tables are EXTERNAL (caller-owned `path`): dropping the catalog entry
 * never deletes data, and a re-created session can re-register the same
 * files. The catalog entry (with its bucketing metadata) is what makes the
 * planner trust the layout — plain `spark.read.parquet` of the same files
 * would NOT know the bucketing and would shuffle.
 */
object BucketedStore {

  /**
   * Write `df` as an external parquet table bucketed (and in-bucket sorted)
   * by `key` into `buckets` buckets at `path`, registered as `name`.
   * Overwrites both catalog entry and data.
   */
  def write(df: DataFrame, name: String, path: String, key: String,
            buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
  }

  /** Read a bucketed table back through the catalog (REQUIRED for the
    * planner to use the bucketing — a raw parquet read of the same path
    * loses the layout metadata). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Drop the catalog entry (external table: data stays on disk). */
  def drop(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
}
