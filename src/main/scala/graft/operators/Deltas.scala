package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / window analytics over the snapshot history (W1-W3).
  *
  * The reference mutates per-partition baseline state in place
  * (kafka_overwatch/overwatch_resources/topics.py:32-45,77-100); here the
  * same quantities are window functions over the append-only history —
  * checkpointable, replayable, and partition-pruned by scan_ts at scale.
  */
object Deltas {

  private val byPartition =
    Window.partitionBy(col("cluster"), col("topic"), col("partition_id"))

  /** W1: consecutive-scan offset delta per partition — the
    * `topic_partition_new_messages` metric feed
    * (overwatch_resources/topics.py:93-100). */
  def partitionDeltas(wm: DataFrame): DataFrame = {
    val w = byPartition.orderBy(col("s"))
    wm.withColumn("prev_high", lag(col("high"), 1).over(w))
      .filter(col("prev_high").isNotNull)
      .select(col("cluster"), col("topic"), col("partition_id"), col("scan_ts"),
        (col("high") - col("prev_high")).as("delta"))
  }

  /** W2: delta since watch start — init_end_offset is the first observation
    * per partition, frozen (overwatch_resources/topics.py:32-34,108-115). */
  def baselineDeltas(wm: DataFrame): DataFrame = {
    val w = byPartition.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wm.select(col("cluster"), col("topic"), col("partition_id"), col("scan_ts"),
      (col("high") - first(col("high")).over(w)).as("messages_since_start"))
  }

  /** W3: log-start (retention) tracking — latest low watermark per
    * partition and whether retention ever moved it
    * (overwatch_resources/topics.py:77-87). */
  def logStart(wm: DataFrame): DataFrame =
    wm.groupBy(col("cluster"), col("topic"), col("partition_id"))
      .agg(max(col("low")).as("first_offset"),
        (max(col("low")) > min(col("low"))).as("retention_moved"))
}
