package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Scoped persist tracking: operators that cache intermediate frames
 * (feature tables, rep tables, vector tables) register them here and call
 * `close()` once their OUTPUT is materialized, so a long-lived session
 * running many operators (the bench runs ~25 in one JVM) doesn't accumulate
 * dead cached blocks in block-manager memory for its whole lifetime.
 *
 * Usage pattern inside an operator:
 * {{{
 *   val scope = new CacheScope
 *   val feats = scope.cache(…)
 *   val out = …(feats)….localCheckpoint(eager = true) // materialize output
 *   scope.close()                                     // free intermediates
 *   out
 * }}}
 *
 * The eager localCheckpoint pins only the operator's (thin) result; the wide
 * intermediates are freed immediately instead of waiting for the async
 * ContextCleaner.
 */
final class CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist AND materialize `df` before returning it. Every CacheScope user
    * is a genuinely multi-consumer frame, and the consumers are fanned out
    * CONCURRENTLY by AQE (independent exchange map sides and broadcast
    * builds all start at once under the one materializing action): with a
    * lazy persist each of them recomputed the full upstream kernel before
    * any cache block existed — measured 14 concurrent re-executions of the
    * simhash feature kernel (~5.6 redundant CPU-s) inside ONE
    * dedup_simhash run, and the same shape in er_pipeline/minhash (guide
    * §1.2: don't compute things twice; §5: caching is only worth it when
    * the cache is actually hit). The eager count() costs one sequential
    * pass — the pass the first consumer needed anyway — and turns every
    * other consumer into a block read. */
  def cache(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = cacheLazy(df, level)
    p.count()
    p
  }

  /** Persist WITHOUT the materializing count — for frames whose FIRST
    * consumer is provably a single sequential action (e.g. the feature
    * pass's raw tokenization, which only the DF-stop aggregate reads before
    * any fan-out): that consumer's own execution builds the cache exactly
    * once, and the eager barrier would only add one serial stage wave plus
    * a full re-read of the cache between build and first use. Callers must
    * document the single-first-consumer argument at the call site — with a
    * concurrent first fan-out this degrades to the N-times-recomputed
    * kernel [[cache]] exists to prevent. */
  def cacheLazy(df: DataFrame,
                level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    frames += p
    p
  }

  /** Unpersist everything registered (non-blocking). Idempotent. */
  def close(): Unit = {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }
}
