package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.cluster.ConnectedComponents
import graft.functions.GraftFunctions._

/**
 * Deduplication operators for large-scale training-data pipelines — exact,
 * MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine — each expressed as
 * declarative DataFrame plans (Catalyst prunes/pushes; one shuffle per
 * logical regroup).
 *
 * These generalize the ER blocking machinery (graft.block.Blocking) to the
 * "near-duplicate document removal" shape used when preparing web-scale
 * corpora: the reference dedups candidate sets exactly
 * (`/root/reference/relik/retriever/data/datasets.py:486-494`,
 * `dropDuplicates` analog F6 in SURVEY.md §2.3); the near-dup family is the
 * web-corpus extension.
 */
object Dedup {

  // ---------------------------------------------------------------- exact
  /**
   * Exact dedup by content hash: one hash-aggregate (map-side combined).
   * Returns (rep_id, n_dups) per distinct content value — rep_id is the
   * minimum id, deterministic under retries.
   */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_dups"))

  /** Rows to keep after exact dedup (the representative of each group). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val reps = exactGroups(df, idCol, textCol).select(col("rep_id").as(idCol))
    df.join(reps, Seq(idCol), "left_semi")
  }

  // ---------------------------------------------------------- MinHash-LSH
  case class MinHashConfig(
      numHashes: Int = 48, bands: Int = 12, rowsPerBand: Int = 4,
      seed: Long = 42L, maxBlock: Int = 256, verifyJaccard: Double = 0.7)

  /**
   * MinHash-LSH near-duplicate groups: shingle → minhash → band →
   * bucket-join → exact-Jaccard verify → connected components.
   * Returns (id, group_id); docs in no near-dup pair keep group_id = id.
   */
  def minhashNearDupGroups(df: DataFrame, idCol: String, textCol: String,
                           cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val feats = df.select(
        col(idCol).cast("string").as("id"),
        token_ngram_hashes(split(normalize_text(col(textCol)), " "), 1, cfg.seed).as("hashes"))
      .withColumn("sig", minhash_signature(col("hashes"), cfg.numHashes, cfg.seed))

    val blocks = feats.select(
      explode(minhash_band_keys(col("sig"), cfg.bands, cfg.rowsPerBand)).as("key"),
      col("id"), col("hashes"))

    val pairs = blockPairs(blocks, struct(col("id"), col("hashes")), cfg.maxBlock)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.hashes").as("h_a"), col("b.hashes").as("h_b"))
      .dropDuplicates("id_a", "id_b")

    val edges = pairs
      .filter(jaccard_sorted(col("h_a"), col("h_b")) >= cfg.verifyJaccard)
      .select(col("id_a").as("url_a"), col("id_b").as("url_b"))

    ConnectedComponents.assignAll(feats.select(col("id").as("url")), edges)
      .select(col("url").as(idCol), col("cluster_id").as("group_id"))
  }

  // --------------------------------------------------------------- SimHash
  case class SimHashConfig(seed: Long = 42L, maxHamming: Int = 6, tables: Int = 4)

  /**
   * SimHash near-dup pairs: 64-bit fingerprints, blocked by `tables`
   * 16-bit key segments (two fingerprints within hamming distance d collide
   * on ≥1 of 4 segments when d ≤ 3 per pigeonhole at d ≤ tables-1 segment
   * errors), verified by exact hamming distance.
   */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          cfg: SimHashConfig = SimHashConfig()): DataFrame = {
    val fp = df.select(
      col(idCol).cast("string").as("id"),
      simhash64(token_ngram_hashes(split(normalize_text(col(textCol)), " "), 1, cfg.seed),
        cfg.seed).as("fp"))

    val segs = (0 until cfg.tables).map { t =>
      fp.select(
        concat(lit(s"$t:"),
          (shiftrightunsigned(col("fp"), t * 16).bitwiseAND(lit(0xffffL))).cast("string")).as("key"),
        col("id"), col("fp"))
    }.reduce(_ unionByName _)

    blockPairs(segs, struct(col("id"), col("fp")), 1024)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming_dist64(col("a.fp"), col("b.fp")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= cfg.maxHamming)
  }

  // --------------------------------------------------------- n-gram Jaccard
  /**
   * Exact token-set Jaccard for candidate pairs produced by any blocking
   * (here parameterized by a join condition on ids — e.g. consecutive ids,
   * or same-block ids). Pure expression work after one self-join.
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, pairCond: (Column, Column) => Column,
                        seed: Long = 42L): DataFrame = {
    val t = df.select(
      col(idCol).as("id"),
      token_ngram_hashes(split(normalize_text(col(textCol)), " "), n, seed).as("hashes"))
    t.as("a").join(t.as("b"), pairCond(col("a.id"), col("b.id")))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        jaccard_sorted(col("a.hashes"), col("b.hashes")).as("jaccard"))
  }

  // ------------------------------------------------------ embedding cosine
  case class EmbeddingConfig(
      bands: Int = 8, bits: Int = 12, seed: Long = 42L,
      maxBlock: Int = 256, minCosine: Double = 0.95)

  /**
   * Embedding near-dup pairs at scale: signed-random-projection LSH buckets
   * (cos-similar vectors collide), then exact cosine verify within buckets.
   * Never materializes the all-pairs matrix.
   */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            cfg: EmbeddingConfig = EmbeddingConfig()): DataFrame = {
    val v = df.select(col(idCol).cast("string").as("id"),
      col(vecCol).cast("array<float>").as("vec"))
    val blocks = v.select(
      explode(srp_band_keys(col("vec"), cfg.bands, cfg.bits, cfg.seed)).as("key"),
      col("id"), col("vec"))
    blockPairs(blocks, struct(col("id"), col("vec")), cfg.maxBlock)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine_sim(col("a.vec"), col("b.vec")).as("cosine"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("cosine") >= cfg.minCosine)
  }

  // ----------------------------------------------------------------- util
  /**
   * Pairs within blocks keyed by `key`: one aggregation, C(n,2) explode for
   * blocks ≤ cap, larger blocks dropped (purging — same skew policy as
   * graft.block.Blocking). Output columns: a, b (the payload structs),
   * ordered a.id < b.id.
   */
  private[graft] def blockPairs(blocks: DataFrame, payload: Column, cap: Int): DataFrame = {
    val grouped = blocks
      .groupBy(col("key"))
      .agg(collect_list(payload).as("ms"), count(lit(1)).as("n"))
      .filter(col("n").between(2, cap))
    grouped
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.PairCombinations(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("ms"))))
        .as(Seq("x", "y")))
      .select(
        when(col("x.id") < col("y.id"), col("x")).otherwise(col("y")).as("a"),
        when(col("x.id") < col("y.id"), col("y")).otherwise(col("x")).as("b"))
  }
}
