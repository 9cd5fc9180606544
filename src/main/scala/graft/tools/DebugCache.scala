package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Is the CacheScope'd feature frame actually substituted into consumer
  * plans as InMemoryTableScan? Prints occurrence counts per consumer. */
object DebugCache {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.ops.Sessions.builder(32, "graft-debug-cache")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d0 = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val d = d0.unionByName(d0.withColumn("doc_id", col("doc_id") + 1000000))
    val scope = new graft.ops.CacheScope
    val fp = scope.cache(d.select(col("doc_id").cast("string").as("id"),
      simhash64(token_ngram_hashes(split(normalize_text(col("text")), " "), 1, 42L), 42L).as("fp")))
    val (pairs, stats) = graft.dedup.Dedup.blockPairsWithStats(
      fp.select(col("fp").as("key"), col("id")),
      struct(col("id")), 1024, Int.MaxValue, 8, p => p("id"), oversizedStar = true)
    val plan = pairs.queryExecution.executedPlan.toString
    println("pairs plan InMemoryTableScan: " + "InMemoryTableScan".r.findAllIn(plan).size)
    println("pairs plan Scan parquet: " + "Scan parquet".r.findAllIn(plan).size)
    println("pairs plan SimHash64-ish kernels: " + "simhash64".r.findAllIn(plan).size)
    val n = pairs.count()
    println("pairs count = " + n)
    // after execution, final adaptive plan:
    val planAfter = pairs.queryExecution.executedPlan.toString
    println("after InMemoryTableScan: " + "InMemoryTableScan".r.findAllIn(planAfter).size)
    println("after simhash64: " + "simhash64".r.findAllIn(planAfter).size)
    spark.stop()
  }
}
