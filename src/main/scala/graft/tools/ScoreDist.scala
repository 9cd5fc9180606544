package graft.tools

import org.apache.spark.sql.functions._

import graft.block.Blocking
import graft.ingest.CorpusGen
import graft.score.PairScorer

/**
 * Score-distribution diagnostic for threshold/weight tuning at SCALE:
 * `ScoreDist [nDocs=100000] [cores=32]`. The 1000-doc DiagSpec variant
 * cannot see the failure mode that matters — with 200×80 first/last name
 * combinations, same-full-name DIFFERENT-entity collisions are ~absent
 * below ~10k entities and universal above ~100k, and any above-threshold
 * leak between them is amplified by transitive closure into cluster
 * chaining (measured: 600k docs → 4,644 clusters, precision 0.69).
 * Prints per-population score percentiles and the component feature
 * breakdown near the boundary.
 */
object ScoreDist {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 100000L
    val cores = if (args.length > 1) args(1).toInt else 32
    // corpus shape matters as much as entity density: the bench/rehearsal
    // corpora are 6×80 (long pages), the suite default is 2×40 — tune
    // thresholds against the shape the target workload actually has
    val paragraphs = if (args.length > 2) args(2).toInt else 2
    val paraWords = if (args.length > 3) args(3).toInt else 40
    val spark = graft.ops.Sessions.builder(cores, "graft-scoredist")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.local.dir", "/tmp/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println(s"== shape: nDocs=$nDocs cores=$cores paragraphs=$paragraphs paraWords=$paraWords")
    val pages = CorpusGen.pages(spark, nDocs, seed = 42L, partitions = cores * 2,
      paragraphs = paragraphs, paraWords = paraWords).cache()
    pages.select(avg(length(col("text"))).as("avg_text_len")).show()
    val gold = CorpusGen.goldPairs(spark, nDocs, seed = 42L, partitions = cores * 2).cache()
    val cfg = Blocking.Config()
    val feats = Blocking.features(pages, cfg).cache()
    val pairs = Blocking.attachFeatures(
      Blocking.candidatePairs(Blocking.blockKeys(feats, cfg), cfg), feats).cache()
    val scored = PairScorer.score(pairs, PairScorer.Config(threshold = 0.0, jaccardFloor = 0.0)).cache()

    val j = gold.join(scored, Seq("url_a", "url_b")).cache()
    for (m <- Seq(true, false)) {
      val d = j.filter($"is_match" === m)
      println(s"== is_match=$m n=${d.count()} (of ${gold.filter($"is_match" === m).count()} gold)")
      d.select(
        expr("percentile(score, array(0.001,0.01,0.05,0.25,0.5,0.75,0.95,0.99,0.999))").as("score_p"),
        expr("percentile(jaccard, array(0.01,0.5,0.99))").as("jac_p"),
        expr("percentile(jaro, array(0.01,0.5,0.99))").as("jaro_p"))
        .collect().foreach(println)
    }
    // scored NON-gold pairs (the impostor stream blocking lets through):
    // everything the scorer sees that gold doesn't label
    val unl = scored.join(gold.select("url_a", "url_b"), Seq("url_a", "url_b"), "left_anti")
    println(s"== unlabeled candidate pairs n=${unl.count()}")
    unl.select(
      expr("percentile(score, array(0.5,0.9,0.99,0.999))").as("score_p"),
      sum(when($"score" >= 0.5, 1L).otherwise(0L)).as("ge_050"),
      sum(when($"score" >= 0.6, 1L).otherwise(0L)).as("ge_060"),
      sum(when($"score" >= 0.7, 1L).otherwise(0L)).as("ge_070"),
      sum(when($"jaccard" >= 0.3 && $"score" >= 0.5, 1L).otherwise(0L)).as("jac03_and_050"))
      .collect().foreach(println)
    // gold-positive recall at candidate thresholds
    val pos = j.filter($"is_match")
    pos.select(
      count(lit(1)).as("n"),
      sum(when($"score" >= 0.5, 1L).otherwise(0L)).as("ge_050"),
      sum(when($"score" >= 0.6, 1L).otherwise(0L)).as("ge_060"),
      sum(when($"score" >= 0.7, 1L).otherwise(0L)).as("ge_070"),
      sum(when($"jaccard" >= 0.3 && $"score" >= 0.5, 1L).otherwise(0L)).as("jac03_and_050"),
      sum(when($"jaccard" >= 0.35 && $"score" >= 0.6, 1L).otherwise(0L)).as("jac035_and_060"))
      .collect().foreach(println)
    // negatives surviving each rule
    val neg = j.filter(!$"is_match")
    neg.select(
      count(lit(1)).as("n"),
      sum(when($"score" >= 0.5, 1L).otherwise(0L)).as("ge_050"),
      sum(when($"score" >= 0.6, 1L).otherwise(0L)).as("ge_060"),
      sum(when($"score" >= 0.7, 1L).otherwise(0L)).as("ge_070"),
      sum(when($"jaccard" >= 0.3 && $"score" >= 0.5, 1L).otherwise(0L)).as("jac03_and_050"),
      sum(when($"jaccard" >= 0.35 && $"score" >= 0.6, 1L).otherwise(0L)).as("jac035_and_060"))
      .collect().foreach(println)
    spark.stop()
  }
}
