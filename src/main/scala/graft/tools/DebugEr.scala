package graft.tools

import org.apache.spark.sql.functions._

/** Measure-first diagnostics for the ER pipeline's pair volumes at a given
  * SF dir: block count, pre-dedup pair stream size, deduped candidates,
  * jaccard-floor survivors, edges. */
object DebugEr {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.ops.Sessions.builder(32, "graft-debug-er")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val both = d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000))
    val pages = both.select(
      col("doc_id").cast("string").as("url"),
      lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")).as("warc_ts"),
      col("text").cast("binary").as("html"), col("text"), lit("en").as("lang"))
      .as[graft.schema.Page](org.apache.spark.sql.Encoders.product[graft.schema.Page])
    val cfg = graft.pipeline.ErPipeline.Config()
    val scope = new graft.ops.CacheScope
    val feats = scope.cache(graft.block.Blocking.features(pages, cfg.blocking, Some(scope))
      .select(col("url"), col("mention"), col("sig"))
      .withColumn("url", graft.functions.GraftFunctions.id128(col("url"))))
    val blocks = graft.block.Blocking.blockKeys(feats, cfg.blocking).persist()
    println("block rows = " + blocks.count())
    println("block key stats:")
    graft.dedup.Dedup.blockBranchStats(
      blocks.select(col("key"), col("url").as("id")), cfg.blocking.maxBlock,
      cfg.blocking.purgeLimit).show(false)
    val pairs = graft.block.Blocking.candidatePairs(blocks, cfg.blocking).persist()
    println("deduped candidate pairs = " + pairs.count())
    val attached = graft.block.Blocking.attachFeatures(pairs, feats)
    val sc = graft.score.PairScorer.scoreColumns(col("mention_a"), col("mention_b"),
      col("sig_a"), col("sig_b"))
    val agg = attached.select(
      count(lit(1)).as("n"),
      sum(when(sc.jaccard >= 0.35, 1L).otherwise(0L)).as("floor_pass"),
      sum(when(sc.accept, 1L).otherwise(0L)).as("edges"))
    agg.show(false)

    // pair-generation subtree costs (no dedup / dedup)
    val tiebreak: org.apache.spark.sql.Column => org.apache.spark.sql.Column = identity
    val rawPairs = graft.dedup.Dedup.blockPairs(
      blocks.select(col("key"), col("url").as("id"), col("mention")),
      struct(col("id")), cfg.blocking.maxBlock, cfg.blocking.purgeLimit,
      cfg.blocking.snWindow,
      rowSortKey = Some(struct(col("mention"), tiebreak(col("id")))))
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[debug-er] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }
    time("raw pair gen (no dedup)") { rawPairs.count() }
    time("raw pair gen again") { rawPairs.count() }
    time("gen + dedup") {
      rawPairs.select(col("a.id").as("url_a"), col("b.id").as("url_b"))
        .dropDuplicates("url_a", "url_b").count() }
    // components, each from the persisted thin pair set (pairs.persist above)
    time("pairs count (cached)") { pairs.count() }
    time("attach only") {
      attached.select(count(col("sig_a")), count(col("sig_b"))).collect()(0).getLong(0) }
    time("attach + jc") {
      attached.select(sum(when(sc.jaccard >= 0.35, 1L).otherwise(0L))).collect()(0) }
    time("attach + jc + jw") {
      attached.select(sum(when(sc.jaccard >= 0.35, sc.jaro).otherwise(0.0))).collect()(0) }
    time("attach + jc + lev") {
      attached.select(sum(when(sc.jaccard >= 0.35, sc.levSim).otherwise(0.0))).collect()(0) }
    time("full score filter") {
      graft.score.PairScorer.score(attached).count() }
    time("full score filter x2") {
      graft.score.PairScorer.score(attached).count() }
    spark.stop()
  }
}
