package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Weather-robust per-query measurement (guide §1: measure first, and on
 * this host measure PAST the Firecracker throttle cycles): times the named
 * SparkEntry queries (or the full headline list) under the EXACT bench
 * session config, in R interleaved rounds, and reports the per-query MIN
 * together with each round's 1-thread ALU canary (same loop as
 * WeatherProbe; clean ≈ 0.75-0.9 s on this guest). The bench of record
 * (graft.Bench) is frozen single-pass per the measurement contract — this
 * tool exists so optimization deltas are not adjudicated on one sample of
 * a host whose effective CPU swings 2.5-4x on ~10-minute cycles
 * (BASELINE.md).
 *
 * Usage: BenchExtra <sfDir> [rounds] [cores] [names,csv|all]
 * Output: one MIN line per query + a final JSON-ish summary line.
 */
object BenchExtra {
  private def canarySec(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < 400000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    if (x == 0) System.err.println("")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 3
    val cores = if (args.length > 2) args(2).toInt else 32
    val headline = Seq(
      "q1_agg", "q3_top_orders", "j3_broadcast_dim", "t1_topk_per_group",
      "w3_sorted_neighborhood", "j8_pair_score", "ngram_jaccard",
      "text_quality", "text_langid", "token_counts", "f6_dedup_exact",
      "ann_topk", "embedding_cosine_pairs", "cc_components",
      "dedup_minhash", "dedup_simhash", "embedding_neardup", "ann_lsh_topk",
      "events_hourly", "stream_windowed", "er_pipeline", "er_clone_pairs",
      "a1_triplet_merge", "rel_per_relation", "p2_sentence_split",
      "dedup_minhash_full", "dedup_simhash_full")
    val names =
      if (args.length > 3 && args(3) != "all") args(3).split(',').map(_.trim).toSeq
      else headline

    val spark = graft.ops.Sessions.builder(cores, "graft-bench-extra")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512L * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (16L * 1024 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def clones(s: SparkSession, dir: String) = {
      import org.apache.spark.sql.functions.col
      val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
      d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000))
    }
    def fn(name: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
      name match {
        case "dedup_minhash_full" =>
          (s, dir) => graft.dedup.Dedup.minhashNearDupGroups(clones(s, dir), "doc_id", "text")
        case "dedup_simhash_full" =>
          (s, dir) => graft.dedup.Dedup.simhashNearDupPairs(clones(s, dir), "doc_id", "text")
        case n => graft.SparkEntry.queries(n)
      }

    // warm-up pass (JIT + codegen), untimed
    names.foreach { n => try fn(n)(spark, sfDir).count() catch { case _: Throwable => () } }

    val samples = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    val canaries = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to rounds).foreach { r =>
      val c = canarySec()
      canaries += c
      names.foreach { n =>
        val t0 = System.nanoTime()
        try fn(n)(spark, sfDir).count() catch { case _: Throwable => () }
        val sec = (System.nanoTime() - t0) / 1e9
        samples(n) = sec :: samples(n)
        System.err.println(f"[bench-extra] round=$r canary=$c%.2f $n $sec%.3f")
      }
    }
    val mins = names.map(n => n -> samples(n).min)
    mins.foreach { case (n, m) => println(f"MIN $n $m%.3f") }
    val total = mins.map(_._2).sum
    val qjson = mins.map { case (n, m) => f""""$n":$m%.3f""" }.mkString("{", ",", "}")
    val cjson = canaries.map(c => f"$c%.2f").mkString("[", ",", "]")
    println(f"""{"metric":"total_min","value":$total%.3f,"unit":"sec","queries":$qjson,"canaries":$cjson,"rounds":$rounds,"sf":"$sfDir"}""")
    spark.stop()
  }
}
