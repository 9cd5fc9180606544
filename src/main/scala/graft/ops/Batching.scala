package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/**
 * Reader-style batching (SURVEY.md §2.6 W2 + §2.7 T5): the reference packs
 * samples into batches under a TOKEN BUDGET after sorting by length, so a
 * batch holds many short rows or few long ones
 * (`/root/reference/relik/reader/data/relik_reader_data.py:141-149,781-810`;
 * ≤ `max_batch_size` rows, ≤ `max_tokens` per batch).
 *
 * Spark-first shape: batching is inherently sequential WITHIN a group, so
 * groups (a language, a blocking key, a partition's worth of windows) are
 * the unit of parallelism — `groupByKey.flatMapGroups` keeps each group's
 * greedy scan in one task while groups spread across the cluster. Group
 * cardinality ~ corpus size / group size, so the operator scales with the
 * data; no group ever exceeds the driver.
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
                         tokensCol: String, budget: Int, maxRows: Int = 128): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(
      col(groupCol).cast("string").as("_1"),
      col(idCol).cast("long").as("_2"),
      col(tokensCol).cast("int").as("_3"))
    val rowEnc = Encoders.product[(String, Long, Int, Int, Int)]
    in.as(Encoders.product[(String, Long, Int)])
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroups { (g: String, it: Iterator[(String, Long, Int)]) =>
        val rows = it.toArray.sortBy(r => (r._3, r._2)) // (tokens, id)
        var batch = 0
        var acc = 0
        var pos = 0
        rows.iterator.map { case (_, id, n) =>
          if (pos > 0 && (acc + n > budget || pos >= maxRows)) {
            batch += 1; acc = 0; pos = 0
          }
          acc += n
          val out = (g, id, n, batch, pos)
          pos += 1
          out
        }
      }(rowEnc)
      .toDF("group", "id", "n_tokens", "batch", "batch_pos")
  }
}
