package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.block.Blocking
import graft.functions.GraftFunctions._
import graft.score.PairScorer

/**
 * Online entity assignment — the streaming face of the ER pipeline.
 *
 * The reference's interactive entry point routes ONE document at a time
 * against a FIXED candidate index
 * (`/root/reference/relik/inference/annotator.py:250`: `__call__` —
 * retrieve → read → link against a prebuilt retriever index); the batch
 * analog here
 * is `ErPipeline` minting clusters offline. This operator is the online
 * half: route each ARRIVING page to its best existing canonical cluster,
 * or flag it novel — the production shape for keeping an entity store
 * current between offline rebuilds.
 *
 * Scale shape (100 TB story):
 *  - the canonical side is one row per CLUSTER, not per document —
 *    broadcastable up to the session's broadcast ceiling, an ordinary
 *    key-equi shuffle join beyond it;
 *  - the stream side carries NO cross-batch state: no watermark store, no
 *    stream-stream join — each micro-batch blocks, scores and argmaxes
 *    independently, so cost tracks batch volume, not stream history. The
 *    only state is the final per-url aggregation within a query run.
 *  - candidate (page, cluster) rows arriving under several shared block
 *    keys are deliberately NOT pre-deduped: rescoring a duplicate is
 *    idempotent under max_by, while a streaming dropDuplicates would grow
 *    state with the stream.
 *
 * Batch/stream parity: `assign` takes either a `spark.read` or a
 * `spark.readStream` DataFrame of (url, text) — same plan, tested for
 * equality in EntityAssignSpec (memory-stream replay).
 */
object EntityAssign {

  /** `hotKeyLimit`: canonical-side keys matching more clusters than this
    * are dropped at canonical-prepare time — a key shared by thousands of
    * clusters (a stop-word mention token, a band bucket of a giant
    * template family) is non-discriminative, and joining it would emit
    * |stream| × |bucket| candidate rows per micro-batch (measured: the
    * unpruned join at 5k docs ground 373 s on first-line stop tokens).
    * Same policy family as the offline pipeline's DF-stop + purge branch. */
  case class Config(block: Blocking.Config = Blocking.Config(),
                    score: PairScorer.Config = PairScorer.Config(),
                    hotKeyLimit: Int = 1024)

  /**
   * The streamable subset of [[Blocking.features]]: pure expressions only.
   * No DF-stop filtering — that is a corpus-wide aggregation belonging to
   * the OFFLINE side, and it must be absent from BOTH sides here so that
   * identical text yields identical signatures (jaccard = 1) regardless of
   * corpus statistics at build vs. query time.
   */
  def pageFeatures(pages: DataFrame, cfg: Blocking.Config = Blocking.Config()): DataFrame = {
    val toks = split(normalize_text(col("text")), " ")
    pages.select(
      col("url"),
      array_join(slice(split(normalize_text(substring_index(col("text"), "\n", 1)), " "),
        1, cfg.mentionMaxTokens), " ").as("mention"),
      minhash_signature(tf_filtered_hashes(toks, cfg.minTf, cfg.minTfKeep, cfg.seed),
        cfg.minhashHashes, cfg.seed).as("sig"))
  }

  /**
   * One deterministic representative (min url) per cluster, carrying the
   * stop-free features the online join scores against. `clusters` is the
   * offline output shape: (url, cluster_id).
   */
  def canonicalReps(pages: DataFrame, clusters: DataFrame,
                    cfg: Blocking.Config = Blocking.Config()): DataFrame = {
    val reps = clusters.groupBy(col("cluster_id")).agg(min(col("url")).as("url"))
    pageFeatures(pages, cfg).join(reps, "url")
      .select(col("cluster_id"), col("mention"), col("sig"))
  }

  /** Blocking keys with the feature payload kept on the row (the batch
    * path's `Blocking.blockKeys` drops `sig` because its pairs re-join
    * features after dedup; the online path scores straight off the join,
    * so the payload rides along). `explode_outer` keeps key-less pages
    * (empty mention and degenerate signature) alive so they surface as
    * NOVEL instead of vanishing. */
  private def keyed(feats: DataFrame, cfg: Blocking.Config): DataFrame = {
    val lsh = feats.select(col("*"),
      explode_outer(minhash_band_keys(col("sig"), cfg.bands, cfg.rowsPerBand)).as("key"))
    val men = feats.select(col("*"),
      explode_outer(token_ngram_hashes(
        filter(split(col("mention"), " "), t => length(t) >= cfg.minMentionTokenLen),
        1, cfg.seed ^ 0x6d656e74L)).as("key"))
    lsh.unionByName(men)
  }

  /**
   * Assign each page to its best canonical cluster passing the conjunctive
   * gate ([[PairScorer.scoreColumns]] — the SAME gate the offline pipeline
   * edges through). Output: (url, cluster_id, score); cluster_id NULL
   * means NOVEL. Ties break to the greater cluster_id, deterministically.
   *
   * Streaming: stream-static left join + update-mode aggregation — run
   * with `.outputMode("update")`; each page's row finalizes when its
   * micro-batch completes (all of a page's candidates arrive in its own
   * batch, so one update per page).
   */
  /**
   * Offline half of the online join: explode the canonical store to its
   * blocking keys and drop hot (non-discriminative) ones. The static
   * subtree of a streaming query re-executes every micro-batch, so
   * long-running streams should `.persist()` this result and pass it to
   * [[assignPrepared]]; [[assign]] calls it inline for one-shot use.
   */
  def prepareCanonical(canonical: DataFrame, cfg: Config = Config()): DataFrame = {
    val cAll = keyed(canonical, cfg.block)
      .filter(col("key").isNotNull) // null keys can never equi-join
      .select(col("key"), col("cluster_id"),
        col("mention").as("c_mention"), col("sig").as("c_sig"))
    val keyCounts = cAll.groupBy(col("key"))
      .agg(count(lit(1)).as("key_n"))
      .filter(col("key_n") <= cfg.hotKeyLimit)
      .select(col("key"))
    cAll.join(keyCounts, "key")
  }

  def assign(pages: DataFrame, canonical: DataFrame, cfg: Config = Config()): DataFrame =
    assignPrepared(pages, prepareCanonical(canonical, cfg), cfg)

  /** [[assign]] against a pre-built (ideally persisted) [[prepareCanonical]]
    * table — the production shape for long-running streams. */
  def assignPrepared(pages: DataFrame, preparedCanonical: DataFrame,
                     cfg: Config = Config()): DataFrame = {
    val sKeys = keyed(pageFeatures(pages, cfg.block), cfg.block)
    val sc = PairScorer.scoreColumns(col("mention"), col("c_mention"),
      col("sig"), col("c_sig"), cfg.score)
    val ok = col("cluster_id").isNotNull && sc.accept
    sKeys.join(preparedCanonical, Seq("key"), "left_outer")
      .groupBy(col("url"))
      .agg(max_by(
          when(ok, struct(col("cluster_id"), sc.score.as("score"))),
          when(ok, struct(sc.score.as("score"), col("cluster_id")))).as("best"))
      .select(col("url"), col("best.cluster_id").as("cluster_id"),
        col("best.score").as("score"))
  }
}
