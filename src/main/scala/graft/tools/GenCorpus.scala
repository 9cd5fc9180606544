package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ingest.CorpusGen

/** Materialize a deterministic bench corpus to parquet:
  * `GenCorpus <outDir> <nDocs> [paragraphs] [paraWords]`. */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val n = args(1).toLong
    val paragraphs = if (args.length > 2) args(2).toInt else 6
    val paraWords = if (args.length > 3) args(3).toInt else 80
    val spark = SparkSession.builder()
      .master("local[*]")
      .appName("graft-gen-corpus")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    CorpusGen.pages(spark, n, seed = 42L, partitions = 64, paragraphs = paragraphs,
        paraWords = paraWords)
      .write.mode("overwrite").parquet(out)
    println(s"GENCORPUS $out $n")
    spark.stop()
  }
}
