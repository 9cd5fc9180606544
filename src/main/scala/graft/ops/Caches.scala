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

  def cache(df: DataFrame,
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
