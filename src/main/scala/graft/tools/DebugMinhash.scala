package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** One-off diagnosis: equal-token-set family structure as SPARK sees it. */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/tmp/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val both = d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000))
    val feats = both.select(
        col("doc_id").cast("string").as("id"),
        token_ngram_hashes(split(normalize_text(col("text")), " "), 1, 42L).as("hashes"))
      .withColumn("setkey", xxhash64(col("hashes").cast("string")))
      .withColumn("sig", minhash_signature(col("hashes"), 48, 42L))
      .withColumn("sigkey", xxhash64(col("sig").cast("string")))
    println("== equal-hash-set family sizes (top) ==")
    feats.groupBy("setkey").count().orderBy(desc("count")).show(5)
    println("== equal-signature family sizes (top) ==")
    feats.groupBy("sigkey").count().orderBy(desc("count")).show(5)
    // band-key block sizes for the biggest family
    val blocks = feats.select(explode(minhash_band_keys(col("sig"), 12, 4)).as("key"), col("id"))
    println("== biggest band-key blocks ==")
    blocks.groupBy("key").count().orderBy(desc("count")).show(5)
    spark.stop()
  }
}
