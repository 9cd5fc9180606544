package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Measure-first breakdown of minhash tier-2 (the dedup_minhash_full hot
  * path) under the bench session config: volumes + wall per subtree. */
object DebugMinhash2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.ops.Sessions.builder(32, "graft-debug-minhash2")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (16L * 1024 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[debug-mh] $label%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val both = d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000))
    val cfg = graft.dedup.Dedup.MinHashConfig()
    val scope = new graft.ops.CacheScope
    val feats = scope.cache(both.select(
        col("doc_id").cast("string").as("id"),
        token_ngram_hashes(split(normalize_text(col("text")), " "), 1, cfg.seed).as("hashes"))
      .withColumn("setkey", graft.functions.GraftFunctions.id128(col("hashes").cast("string"))))
    time("feats cache build (done above)") { feats.count() }
    val (exactPairs0, setStats) = graft.dedup.Dedup.blockPairsWithStats(
      feats.select(col("setkey").as("key"), col("id")),
      struct(col("id")), cfg.maxBlock, Int.MaxValue, cfg.snWindow, p => p("id"),
      oversizedStar = true)
    time("tier1 exact pairs") { exactPairs0.count() }
    val reps = scope.cache(setStats
      .select(col("key").as("setkey"), col("pmin.id").as("id"))
      .join(feats.select(col("setkey"), col("id"), col("hashes")), Seq("setkey", "id"))
      .withColumn("sig", minhash_signature(col("hashes"), cfg.numHashes, cfg.seed)))
    time("reps cache (count)") { reps.count() }
    val blocks = reps.select(
      explode(minhash_band_keys(col("sig"), cfg.bands, cfg.rowsPerBand)).as("key"),
      col("id"))
    time("blocks count") { blocks.count() }
    time("block stats") {
      graft.dedup.Dedup.blockBranchStats(blocks, cfg.maxBlock, cfg.purgeLimit)
        .collect().mkString(";") }
    val thin0 = graft.dedup.Dedup.blockPairs(blocks, struct(col("id")), cfg.maxBlock,
        cfg.purgeLimit, cfg.snWindow, p => p("id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("thin pairs pre-dedup") { thin0.count() }
    val thin = thin0.dropDuplicates("id_a", "id_b").persist()
    time("thin pairs deduped") { thin.count() }
    val ha = reps.as("mh_a")
    val hb = reps.as("mh_b")
    val nearPairs = thin
      .join(ha, col("id_a") === col("mh_a.id"))
      .join(hb, col("id_b") === col("mh_b.id"))
      .withColumn("jaccard", jaccard_sorted(col("mh_a.hashes"), col("mh_b.hashes")))
      .filter(col("jaccard") >= cfg.verifyJaccard)
    time("verify join + jaccard") { nearPairs.count() }
    time("verify join + jaccard x2") { nearPairs.count() }
    spark.stop()
  }
}
