package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time streaming aggregation (SURVEY §2.9 Spark mapping): tumbling
  * windows with watermarked late-data handling over the events stream.
  *
  * The reference polls and therefore never sees late data; a real event
  * stream does. The watermark bounds state: windows older than the
  * watermark finalize and evict, so state size is O(active windows), not
  * O(history) — the property that lets this run forever at 100 TB/day.
  *
  * Works identically over a batch DataFrame (no watermark semantics
  * needed) and a streaming Dataset — the test drives both and compares.
  */
object EventStream {

  case class Event(event_id: Long, epoch_s: Long, user_id: Long,
                   event_type: String, value: Double)

  /** Tumbling per-minute counts and exact value sums per event type.
    * Takes epoch-seconds (the nanos-as-long parquet read divided down) and
    * aggregates on a real TIMESTAMP column so streaming watermarks apply. */
  def minuteRollup(events: Dataset[Event], watermarkDelay: String = "2 minutes"): DataFrame = {
    val withTs = events.withColumn("ts", timestamp_seconds(col("epoch_s")))
    val maybeWatermarked =
      if (events.isStreaming) withTs.withWatermark("ts", watermarkDelay) else withTs
    maybeWatermarked
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("window.start").as("minute_start"), col("event_type"),
        col("events"), col("value_sum"))
  }

  /** Event-time session windows per user (30-minute gap) — the native
    * merge-on-overlap stateful window (the streaming face of
    * operators/Relational.sessionWindows). In streaming append mode a
    * session emits once the watermark passes its end, so state is
    * O(open sessions) — the property that makes per-user sessionization
    * run forever. Batch and stream produce identical rows once the
    * watermark flushes (LakeAndEventStreamSpec). */
  def sessionRollup(events: Dataset[Event],
                    watermarkDelay: String = "0 seconds"): DataFrame = {
    val withTs = events.withColumn("ts", timestamp_seconds(col("epoch_s")))
    val maybeWatermarked =
      if (events.isStreaming) withTs.withWatermark("ts", watermarkDelay) else withTs
    maybeWatermarked
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("events"))
      .select(col("user_id"), col("w.start").cast("long").as("s_start"),
        col("w.end").cast("long").as("s_end"), col("events"))
  }
}
