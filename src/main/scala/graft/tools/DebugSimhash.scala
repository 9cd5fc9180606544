package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Scratch diagnostics for the simhash tier-2 candidate volume at a given
  * SF dir (measure-first: is the 2s job pair volume or overhead?). */
object DebugSimhash {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.ops.Sessions.builder(32, "graft-debug-simhash")
      .config("spark.sql.shuffle.partitions", "64")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d0 = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val d = d0.unionByName(d0.withColumn("doc_id", col("doc_id") + 1000000))
    val fp = d.select(col("doc_id").cast("string").as("id"),
      simhash64(token_ngram_hashes(split(normalize_text(col("text")), " "), 1, 42L), 42L).as("fp"))
    val reps = fp.groupBy(col("fp")).agg(min(col("id")).as("id"))
    println("distinct fps = " + reps.count())
    val blocks = reps.select(
      explode(simhash_band_keys(col("fp"), 8, 2)).as("key"), col("id"), col("fp"))
    val sizes = blocks.groupBy("key").count()
    sizes.agg(count(lit(1)).as("n_keys"), max("count").as("max_block"),
      sum(expr("count * (count - 1) / 2")).as("naive_pairs"),
      sum(expr("CASE WHEN count <= 1024 THEN count * (count - 1) / 2 ELSE 0 END")).as("small_pairs"),
      sum(expr("CASE WHEN count > 1024 AND count <= 1000000 THEN count * 8 ELSE 0 END")).as("sn_pairs_approx"))
      .show(false)

    // EXACT simhashNearDupPairs shape (shared stats, both tiers, union)
    // minus the final checkpoint: where does the C(n,2) stream's
    // parallelism come from in the FINAL adaptive plan?
    val scope = new graft.ops.CacheScope
    val fpC = scope.cache(fp)
    val (exactPairs0, fpStats) = graft.dedup.Dedup.blockPairsWithStats(
      fpC.select(col("fp").as("key"), col("id")),
      struct(col("id")), 1024, Int.MaxValue, 8, p => p("id"), oversizedStar = true)
    val exactPairs = exactPairs0
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), lit(0).as("hamming"))
    val reps0 = fpStats.select(col("key").as("fp"), col("pmin.id").as("id"))
    val blocks2 = reps0.select(
      explode(simhash_band_keys(col("fp"), 8, 2)).as("key"), col("id"), col("fp"))
    val nearPairs = graft.dedup.Dedup.blockPairs(blocks2, struct(col("id"), col("fp")),
        1024, 1000000, 8, p => p("fp"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming_dist64(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming").between(1, 6))
      .dropDuplicates("id_a", "id_b")
    val outU = exactPairs.unionByName(nearPairs)
    println("union out count = " + outU.count())
    println(outU.queryExecution.executedPlan.toString)
    scope.close()

    spark.stop()
  }
}
