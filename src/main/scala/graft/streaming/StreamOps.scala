package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Structured Streaming operators (SURVEY.md §2.10: the reference has no
 * stream processing — its closest machinery is generator pipelining with
 * bounded buffers, `/root/reference/relik/reader/data/relik_reader_data.py:
 * 510-539` — so these are the engine's streaming extension, built on
 * event-time watermarks).
 *
 * Batch/stream parity: every function here takes a DataFrame that may be
 * either `spark.read` or `spark.readStream` output — the plan is identical,
 * which is the Spark-native way to keep one codepath for both (tested in
 * batch via the same functions, driven in streaming via memory sinks).
 */
object StreamOps {

  /**
   * Tumbling/sliding event-time window aggregation with late-data handling.
   * P3's count windows become time windows here.
   */
  def windowedEventStats(events: DataFrame, tsCol: String = "ts",
                         windowLen: String = "5 minutes", slide: String = "5 minutes",
                         watermark: String = "10 minutes"): DataFrame = {
    // parquet TIMESTAMP(isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ;
    // event-time watermarks require LTZ — cast is a no-op under UTC session tz
    val cast = events.withColumn(tsCol, col(tsCol).cast("timestamp"))
    val in = if (cast.isStreaming) cast.withWatermark(tsCol, watermark) else cast
    in.groupBy(window(col(tsCol), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("total_value"))
  }

  /**
   * Streaming exact dedup by key within the watermark horizon — the
   * streaming face of Dedup.exactDedup (state bounded by the watermark).
   */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  tsCol: String = "ts", watermark: String = "10 minutes"): DataFrame = {
    val cast = events.withColumn(tsCol, col(tsCol).cast("timestamp"))
    if (cast.isStreaming)
      cast.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
    else cast.dropDuplicates(keyCols)
  }

  /**
   * Sessionization: gap-based session windows per user (the stateful
   * operator family — session_window is the declarative form; custom state
   * would use flatMapGroupsWithState).
   */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 tsCol: String = "ts", watermark: String = "10 minutes"): DataFrame = {
    val cast = events.withColumn(tsCol, col(tsCol).cast("timestamp"))
    val in = if (cast.isStreaming) cast.withWatermark(tsCol, watermark) else cast
    in.groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))
  }
}
