package graft.pipeline

import graft.SparkSpec
import graft.block.Blocking
import graft.eval.PairwiseF1
import graft.ingest.CorpusGen
import graft.score.PairScorer

class ErPipelineSpec extends SparkSpec {

  private val N = 1000L

  lazy val pages = CorpusGen.pages(spark, N, seed = 42L).cache()
  lazy val gold = CorpusGen.goldPairs(spark, N, seed = 42L).cache()

  test("generator invariant: text == ExtractText(html) per row") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    val bad = pages.toDF()
      .filter(not(extract_text(col("html")) <=> col("text")))
      .count()
    assert(bad == 0L)
  }

  test("gold pairs population is labeled both ways") {
    import org.apache.spark.sql.functions._
    val counts = gold.groupBy("is_match").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse(true, 0L) > 500, s"positives: $counts")
    assert(counts.getOrElse(false, 0L) > 100, s"negatives: $counts")
    assert(gold.filter(col("url_a") >= col("url_b")).count() == 0)
  }

  test("blocking recall on labeled matching pairs ≥ 0.99") {
    val feats = Blocking.features(pages, Blocking.Config())
    val pairs = Blocking.candidatePairs(Blocking.blockKeys(feats), Blocking.Config())
    val recall = PairwiseF1.blockingRecall(gold, pairs)
    info(s"blocking recall = $recall, candidate pairs = ${pairs.count()}")
    assert(recall >= 0.99, s"blocking recall $recall")
  }

  test("end-to-end pairwise F1 ≥ 0.99 (north-rule metric)") {
    val (clusters, res) = ErPipeline.runAndEvaluate(pages, gold)
    info(s"pairwise $res")
    info(s"clusters: ${clusters.select("cluster_id").distinct().count()} over ${clusters.count()} pages")
    assert(res.f1 >= 0.99, s"pairwise F1 ${res.f1} ($res)")
  }

  test("precision holds in the name-collision regime (100k docs)") {
    // the failure class the 1000-doc gate CANNOT see: with ~16k distinct
    // first/last combinations, ≥20k entities guarantee same-full-name
    // different-entity collisions, whose pairs score jaro≈lev≈1 — without
    // the scorer's conjunctive jaccard floor they leak past the threshold
    // and transitive closure chains clusters (measured at 600k docs with
    // τ=0.5/no floor: 4,644 clusters for ~120k entities, precision 0.69;
    // with τ=0.6 ∧ jaccard ≥ 0.35: precision 1.0000, recall 0.9991).
    val p3 = CorpusGen.pages(spark, 100000L, seed = 42L).cache()
    val g3 = CorpusGen.goldPairs(spark, 100000L, seed = 42L).cache()
    val (clusters, res) = ErPipeline.runAndEvaluate(p3, g3)
    val nClusters = clusters.select("cluster_id").distinct().count()
    info(s"100k-doc pairwise $res, clusters=$nClusters")
    assert(res.precision >= 0.99, s"precision ${res.precision} ($res)")
    assert(res.recall >= 0.99, s"recall ${res.recall} ($res)")
    // cluster count ≈ entity count (over-merge collapses it by orders)
    assert(nClusters > 15000L, s"cluster chaining suspected: $nClusters clusters")
    p3.unpersist(); g3.unpersist()
  }

  test("hash-id path ≡ string-id path: identical (url, cluster_id) output") {
    // the 128-bit-id hot path (Config.hashIds, the production default) must
    // not change SEMANTICS, only shuffle bytes: same candidate pairs (the
    // SN tiebreak is id128(id) on both paths by construction), same edges,
    // same components, and — via relabelMinUrl — the exact same min-url
    // cluster labels. Exact multiset equality, not just partition equality.
    val p2 = CorpusGen.pages(spark, 20000L, seed = 99L).cache()
    val viaHash = ErPipeline.run(p2, ErPipeline.Config(hashIds = true))
    val viaUrl = ErPipeline.run(p2, ErPipeline.Config(hashIds = false))
    val onlyHash = viaHash.exceptAll(viaUrl).count()
    val onlyUrl = viaUrl.exceptAll(viaHash).count()
    assert(onlyHash == 0 && onlyUrl == 0,
      s"id disciplines diverged: $onlyHash rows only in hash path, $onlyUrl only in url path")
    p2.unpersist()
  }

  test("batch-incremental ER ≡ full rebuild on corpus ∪ batch") {
    import org.apache.spark.sql.functions._
    // corpus-independent features (DF-stops off) + all-pairs blocking
    // regime: the exact-equivalence precondition incremental() documents
    val cfg = ErPipeline.Config(
      blocking = Blocking.Config(dfStopRatio = 1.0, maxBlock = 4096),
      hashIds = false)
    val all = CorpusGen.pages(spark, 1200L, seed = 7L).cache()
    // deterministic split: ~1/4 of docs arrive as the new batch — some are
    // clone-cluster members whose siblings are in the old corpus (edges into
    // existing clusters), some clusters land wholly in the batch (novel
    // clusters), and singletons cover the no-edge path
    val isNew = xxhash64(col("url")) % 4 === 0
    val oldPages = all.filter(!isNew).cache()
    val newPages = all.filter(isNew).cache()

    val oldAssign = ErPipeline.run(oldPages, cfg)
      .localCheckpoint(true)
    val feats = (p: org.apache.spark.sql.Dataset[graft.schema.Page]) =>
      Blocking.features(p, cfg.blocking).select(col("url"), col("mention"), col("sig"))
    val inc = ErPipeline.incremental(feats(oldPages), oldAssign, feats(newPages), cfg)
    val full = ErPipeline.run(all, cfg)

    assert(inc.count() == all.count(), "incremental must cover every doc exactly once")
    val onlyInc = inc.exceptAll(full).count()
    val onlyFull = full.exceptAll(inc).count()
    assert(onlyInc == 0 && onlyFull == 0,
      s"incremental diverged from full rebuild: $onlyInc vs $onlyFull rows")
    Seq(all, oldPages, newPages).foreach(_.unpersist())
  }

  test("end-to-end F1 ≥ 0.99 at the bench corpus shape (6×80)") {
    // the round-5 regression class: thresholds tuned on the 2×40 suite
    // shape silently failed at the bench's 6-paragraph × 80-word pages
    // (pairwise F1 0.37) until the TF-filter/DF-stop hash domains were
    // unified and topic vocabulary was drawn from a pool disjoint from the
    // glue fillers. Pin quality at the shape the scaling bench measures.
    val p4 = CorpusGen.pages(spark, 10000L, seed = 42L,
      paragraphs = 6, paraWords = 80).cache()
    val g4 = CorpusGen.goldPairs(spark, 10000L, seed = 42L).cache()
    val (_, res) = ErPipeline.runAndEvaluate(p4, g4)
    info(s"6×80-shape pairwise $res")
    assert(res.f1 >= 0.99, s"pairwise F1 ${res.f1} at 6×80 shape ($res)")
    p4.unpersist(); g4.unpersist()
  }

  test("DF-stop wipeout guard: boilerplate-only corpus keeps clone recall") {
    // a corpus whose ENTIRE vocabulary is corpus-frequent (df > 10%): the
    // stop list covers every token, and without the minTfKeep fallback in
    // Blocking.features every doc's feature set is subtracted to empty —
    // one sentinel signature, one mega-block, clone recall collapsing to
    // the sorted-neighborhood window (observed on the driver's sf0.001
    // documents table: 31 distinct tokens, 30 stopped, er_clone_pairs
    // 7/500). Every exact-clone pair must land in one cluster.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val base = (0 until 200).map { i =>
      // every doc: 12 tokens drawn round-robin from the tiny shared pool
      val text = (0 until 12).map(j => vocab((i * 7 + j * 5) % vocab.length)).mkString(" ")
      graft.schema.Page(f"doc$i%06d", ts, Array.emptyByteArray, text, "en")
    }
    val clones = base.map(p => p.copy(url = "clone" + p.url))
    val pages5 = spark.createDataset(base ++ clones)
    val clusters = ErPipeline.run(pages5)
    val paired = clusters.as("a").join(clusters.as("b"),
        col("b.url") === concat(lit("clone"), col("a.url")) &&
        col("a.cluster_id") === col("b.cluster_id"))
      .count()
    assert(paired == 200L, s"only $paired/200 clone pairs share a cluster")
  }

  test("scorer: expression path == typed mapPartitions path") {
    import org.apache.spark.sql.functions._
    val feats = Blocking.features(pages, Blocking.Config())
    val pairs = Blocking.attachFeatures(
      Blocking.candidatePairs(Blocking.blockKeys(feats), Blocking.Config()), feats).cache()
    val viaExpr = PairScorer.score(pairs)
    import spark.implicits._
    val viaTyped = PairScorer.scoreTyped(pairs.as[PairScorer.PairRow])
    val a = viaExpr.select("url_a", "url_b").except(viaTyped.toDF().select("url_a", "url_b")).count()
    val b = viaTyped.toDF().select("url_a", "url_b").except(viaExpr.select("url_a", "url_b")).count()
    assert(a == 0 && b == 0, s"paths disagree: $a/$b")
    pairs.unpersist()
  }
}
