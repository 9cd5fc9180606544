package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.block.Blocking
import graft.cluster.ConnectedComponents
import graft.eval.PairwiseF1
import graft.ops.{Checkpoints, Lineage}
import graft.schema.Page
import graft.score.PairScorer

/**
 * The end-to-end record-linkage pipeline (north rule): blocking → pairwise
 * scoring → transitive clustering, the Spark-first reframing of the
 * reference's retrieve → read → link flow (SURVEY.md §3.1-3.2; reference
 * driver `/root/reference/relik/inference/annotator.py:250-630`).
 *
 * `run` executes lazily end-to-end (bench path, no intermediate I/O);
 * `runCheckpointed` commits each stage as a snapshot table with manifest +
 * lineage counters and resumes any completed stage (north-rule contract).
 */
object ErPipeline {

  case class Config(
      blocking: Blocking.Config = Blocking.Config(),
      scorer: PairScorer.Config = PairScorer.Config()) {
    def fingerprint: String =
      s"b=${blocking.bands}x${blocking.rowsPerBand},mh=${blocking.minhashHashes}," +
        s"seed=${blocking.seed},cap=${blocking.maxBlock},sn=${blocking.snWindow}," +
        s"w=${scorer.weights.jaro}/${scorer.weights.lev}/${scorer.weights.jaccard}," +
        s"tau=${scorer.threshold}"
  }

  /** pages → (url, cluster_id). `feats` is consumed twice (block keys and
    * scorer payload) and its computation — extraction, normalization,
    * tokenization, MinHash over every page — dominates map-side cost, so it
    * is persisted for the run instead of recomputed per consumer. The
    * connected-components step runs eagerly, so by the time `assignAll`
    * returns the edge pipeline has been fully consumed and every cache from
    * this run can be freed (the bench and scaling suite run this many times
    * in one JVM; leaked caches compound). */
  def run(pages: Dataset[Page], cfg: Config = Config()): DataFrame = {
    val scope = new graft.ops.CacheScope
    val feats = scope.cache(Blocking.features(pages, cfg.blocking, Some(scope)))
    val blocks = Blocking.blockKeys(feats, cfg.blocking)
    val pairs = Blocking.candidatePairs(blocks, cfg.blocking)
    val edges = PairScorer.score(Blocking.attachFeatures(pairs, feats), cfg.scorer)
    val out = ConnectedComponents.assignAll(pages.toDF().select("url"), edges)
    scope.close()
    out
  }

  /** Checkpointed variant: every stage is a committed snapshot (resume-safe). */
  def runCheckpointed(spark: SparkSession, pages: Dataset[Page], workDir: String,
                      cfg: Config = Config()): DataFrame = {
    val fp = cfg.fingerprint

    val pagesT = Checkpoints.stage(spark, s"$workDir/pages", "pages", fp) {
      pages.toDF()
    }
    Lineage.writeCounters(s"$workDir/pages", "pages", pagesT)

    val feats = Checkpoints.stage(spark, s"$workDir/features", "features", fp) {
      Blocking.features(pagesT.as[Page](org.apache.spark.sql.Encoders.product[Page]), cfg.blocking)
    }
    Lineage.writeCounters(s"$workDir/features", "features", feats)

    val pairs = Checkpoints.stage(spark, s"$workDir/pairs", "pairs", fp) {
      Blocking.candidatePairs(Blocking.blockKeys(feats, cfg.blocking), cfg.blocking)
    }
    Lineage.writeCounters(s"$workDir/pairs", "pairs", pairs)

    val edges = Checkpoints.stage(spark, s"$workDir/edges", "edges", fp) {
      PairScorer.score(Blocking.attachFeatures(pairs, feats), cfg.scorer)
    }
    Lineage.writeCounters(s"$workDir/edges", "edges", edges)

    val clusters = Checkpoints.stage(spark, s"$workDir/clusters", "clusters", fp) {
      ConnectedComponents.assignAll(pagesT.select("url"), edges)
    }
    Lineage.writeCounters(s"$workDir/clusters", "clusters", clusters)
    clusters
  }

  /** Convenience: run + evaluate against labeled pairs. */
  def runAndEvaluate(pages: Dataset[Page], goldPairs: DataFrame,
                     cfg: Config = Config()): (DataFrame, PairwiseF1.Result) = {
    val clusters = run(pages, cfg)
    val res = PairwiseF1.evaluate(goldPairs, clusters)
    (clusters, res)
  }
}
