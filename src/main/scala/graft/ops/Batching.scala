package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/**
 * Reader-style batching (SURVEY.md §2.6 W2 + §2.7 T5): the reference packs
 * samples into batches under a TOKEN BUDGET after sorting by length, so a
 * batch holds many short rows or few long ones
 * (`/root/reference/relik/reader/data/relik_reader_data.py:141-149,781-810`;
 * ≤ `max_batch_size` rows, ≤ `max_tokens` per batch).
 *
 * Scale shape (the round-2 version held an entire group in ONE task via
 * `groupByKey(group).toArray` — at 100 TB the "en" group is most of the
 * corpus in a single executor: OOM, not slowdown). This version never
 * materializes more than `chunkRows` rows in any task, in three steps:
 *
 *  1. GLOBAL RANK, distributed: range-partition by (group, tokens, id) —
 *     each partition holds a contiguous slice of each group's sort order —
 *     then global rank within group = per-(partition, group) local
 *     row_number + a prefix sum of per-(partition, group) counts (a tiny
 *     P×G aggregate, windowed per group — never collected to the driver).
 *  2. CHUNK: chunk = rank / chunkRows. The greedy pack RESTARTS at each
 *     chunk boundary — a deterministic, data-dependent rule (NOT a
 *     partition-placement artifact), so results are reproducible at any
 *     parallelism and replayable by a sequential oracle. Cost: at most one
 *     underfull batch per chunkRows rows (≤ budget/chunkRows ≈ 0.05%
 *     padding waste at the defaults).
 *  3. PACK per (group, chunk): the inherently-sequential greedy scan runs
 *     in one task per chunk (≤ chunkRows rows), then batch ids are
 *     renumbered across chunks with one more tiny prefix-sum aggregate.
 *
 * A group smaller than `chunkRows` (every group at test scale) is a single
 * chunk, making the output IDENTICAL to the one-pass sequential greedy the
 * DuckDB oracle replays.
 */
object Batching {

  /**
   * Greedy token-budget batching per group, rows visited in ascending
   * (tokens, id) order (W2 sort-by-length: rows in a batch have similar
   * length, minimizing padding waste in the reference's tensor batches).
   * Emits (group, id, n_tokens, batch, batch_pos); batch ids start at 0 per
   * group; a row larger than the budget gets its own batch.
   */
  def tokenBudgetBatches(df: DataFrame, groupCol: String, idCol: String,
                         tokensCol: String, budget: Int, maxRows: Int = 128,
                         chunkRows: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val shuffleP = spark.sessionState.conf.numShufflePartitions

    val in = df.select(
      col(groupCol).cast("string").as("group"),
      col(idCol).cast("long").as("id"),
      col(tokensCol).cast("int").as("n_tokens"))

    // -- step 1: global rank within group, without a per-group single task.
    // Range partitioning on the full sort key makes each partition a
    // contiguous slice of the global (group, tokens, id) order, so
    // rank = (rows of this group in earlier partitions) + local row_number.
    //
    // Materialized EAGERLY (checkpoint pins pid alongside the rows): both
    // consumers below — the wLocal window and the offsets aggregate — must
    // see the SAME physical range partitioning, and without an explicit
    // materialization that only holds while Catalyst's exchange-reuse
    // optimization fires (RangePartitioner samples boundaries with an
    // RDD-id-derived seed; two independent instantiations of the exchange
    // could pick different boundaries and silently corrupt batch ids). The
    // checkpoint blocks are reclaimed by the ContextCleaner once the result
    // is dropped.
    val ranged = in
      .repartitionByRange(shuffleP, $"group", $"n_tokens", $"id")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy($"pid", $"group").orderBy($"n_tokens", $"id")
    val local = ranged.withColumn("local_rn", row_number().over(wLocal))

    val wPrefix = org.apache.spark.sql.expressions.Window
      .partitionBy($"group").orderBy($"pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy($"pid", $"group").agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum($"cnt").over(wPrefix), lit(0L)))
      .select($"pid", $"group", $"offset")

    val chunked = local.join(offsets, Seq("pid", "group"))
      .withColumn("rank", $"offset" + $"local_rn" - 1)
      .withColumn("chunk", ($"rank" / chunkRows).cast("long"))
      .select($"group", $"chunk", $"id", $"n_tokens", $"rank")

    // -- step 2: greedy pack per (group, chunk) — each task ≤ chunkRows rows
    val packed = chunked
      .select($"group", $"chunk", $"id", $"n_tokens", $"rank")
      .as(Encoders.product[(String, Long, Long, Int, Long)])
      .groupByKey(r => (r._1, r._2))(Encoders.product[(String, Long)])
      .flatMapGroups { (gc: (String, Long), it: Iterator[(String, Long, Long, Int, Long)]) =>
        val rows = it.toArray.sortBy(_._5) // rank order == (tokens, id) order
        var batch = 0
        var acc = 0
        var pos = 0
        rows.iterator.map { case (_, _, id, n, _) =>
          if (pos > 0 && (acc + n > budget || pos >= maxRows)) {
            batch += 1; acc = 0; pos = 0
          }
          acc += n
          val out = (gc._1, gc._2, id, n, batch, pos)
          pos += 1
          out
        }
      }(Encoders.product[(String, Long, Long, Int, Int, Int)])
      .toDF("group", "chunk", "id", "n_tokens", "local_batch", "batch_pos")

    // -- step 3: renumber batches across chunks (tiny per-(group, chunk)
    // aggregate + prefix sum per group)
    val wChunk = org.apache.spark.sql.expressions.Window
      .partitionBy($"group").orderBy($"chunk")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val batchOffsets = packed.groupBy($"group", $"chunk")
      .agg((max($"local_batch") + 1).as("n_batches"))
      .withColumn("batch_offset", coalesce(sum($"n_batches").over(wChunk), lit(0L)))
      .select($"group", $"chunk", $"batch_offset")

    packed.join(batchOffsets, Seq("group", "chunk"))
      .select($"group", $"id", $"n_tokens",
        ($"batch_offset" + $"local_batch").cast("int").as("batch"), $"batch_pos")
  }
}
