package graft.pipeline

import graft.SparkSpec
import graft.block.Blocking
import graft.ingest.CorpusGen
import org.apache.spark.sql.functions._

/** Temporary diagnostics: inspect gold positives missed by blocking/scoring. */
class DiagSpec extends SparkSpec {
  test("diag: tf kernel on generated text") {
    import graft.functions.{HashKernels, StringSimKernels}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def tokensOf(docIdx: Long): Array[String] = {
      val html = CorpusGen.genHtml(42L, docIdx, 200L).getBytes("UTF-8")
      val text = graft.functions.TextExtract.extract(html)
      StringSimKernels.normalize(text).split(" ")
    }
    for ((a, b) <- Seq((0L, 200L), (67L, 467L), (114L, 514L))) {
      val ta = tokensOf(a); val tb = tokensOf(b)
      def freq(ts: Array[String]) = HashKernels.tfFilteredHashes(
        new GenericArrayData(ts.map(UTF8String.fromString): Array[Any]), 2, 8, 42L).toLongArray()
      val fa = freq(ta); val fb = freq(tb)
      val j = {
        val sa = fa.toSet; val sb = fb.toSet
        sa.intersect(sb).size.toDouble / sa.union(sb).size
      }
      val counts = ta.groupBy(identity).view.mapValues(_.length).toMap
      info(s"pair($a,$b): tokens=${ta.length} distinct=${ta.distinct.length} freqA=${fa.length} freqB=${fb.length} jacc=$j")
      info("  tf>=2 tokens: " + counts.filter(_._2 >= 2).toSeq.sortBy(-_._2).take(25).mkString(" "))
    }
  }

  test("diag: missed positive pairs") {
    import spark.implicits._
    val N = 1000L
    val pages = CorpusGen.pages(spark, N, 42L).cache()
    val gold = CorpusGen.goldPairs(spark, N, 42L).cache()
    val cfg = Blocking.Config()
    val feats = Blocking.features(pages, cfg).cache()
    val pairs = Blocking.candidatePairs(Blocking.blockKeys(feats, cfg), cfg).cache()

    val pos = gold.filter($"is_match")
    val missed = pos.join(pairs.select("url_a", "url_b"), Seq("url_a", "url_b"), "left_anti")

    val fa = feats.select($"url".as("url_a"), $"mention".as("m_a"), $"sig".as("s_a"), $"tokenHashes".as("t_a"))
    val fb = feats.select($"url".as("url_b"), $"mention".as("m_b"), $"sig".as("s_b"), $"tokenHashes".as("t_b"))
    val det = missed.join(fa, "url_a").join(fb, "url_b")
      .select($"url_a", $"url_b", $"m_a", $"m_b",
        graft.functions.GraftFunctions.minhash_overlap($"s_a", $"s_b").as("sigj"),
        graft.functions.GraftFunctions.jaccard_sorted($"t_a", $"t_b").as("tokj"))
    val rows = det.collect()
    info(s"missed ${rows.length} positive pairs")
    rows.take(30).foreach(r => info(r.toString))

    // also: scored-but-rejected near the boundary
    val edges = graft.score.PairScorer.score(Blocking.attachFeatures(pairs, feats), graft.score.PairScorer.Config(threshold = 0.0, jaccardFloor = 0.0)).cache()
    val posScored = pos.join(edges, Seq("url_a", "url_b"))
    info("positive score distribution:")
    posScored.select(min($"score"), expr("percentile(score, array(0.01,0.05,0.5))"), max($"score")).collect().foreach(r => info(r.toString))
    val negScored = gold.filter(!$"is_match").join(edges, Seq("url_a", "url_b"))
    info("negative score distribution:")
    negScored.select(min($"score"), expr("percentile(score, array(0.5,0.95,0.99))"), max($"score")).collect().foreach(r => info(r.toString))
  }
}
