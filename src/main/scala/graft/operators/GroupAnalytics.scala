package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Snapshots.NumScans

/** Consumer-group lag analytics: the reference's lag join and `groups_df`.
  *
  * Reference: per-partition lag at
  * kafka_overwatch/overwatch_resources/groups.py:98-144 (J1/A3/A4);
  * groups_df at overwatch_resources/clusters.py:332-342 (P2).
  */
object GroupAnalytics {

  /** J1: group committed offsets joined to partition watermarks at the
    * latest scan; lag = high - committed.
    *
    * Guards (P12, overwatch_resources/groups.py:111-130): partitions with
    * zero total messages are skipped, and committed < 0 ("no committed
    * offset") is skipped *per partition* — deliberately fixing quirk Q3
    * (the reference `break`s out of the whole topic).
    *
    * Scale: watermarks are tiny relative to a 100 TB offsets history, and
    * the join keys (cluster, topic, partition_id) prefix-align with the
    * snapshot partitioning — Catalyst broadcasts the watermark side.
    */
  def lagRows(wm: DataFrame, go: DataFrame): DataFrame = {
    val wLatest = wm.filter(col("s") === NumScans)
      .select(col("cluster"), col("topic"), col("partition_id"), col("low"), col("high"))
    go.filter(col("s") === NumScans)
      .join(broadcast(wLatest), Seq("cluster", "topic", "partition_id"))
      .filter(col("high") - col("low") > 0 && col("committed") >= 0)
      .select(col("cluster"), col("grp"), col("topic"), col("partition_id"),
        (col("high") - col("committed")).as("lag"))
  }

  /** A3: per-(group, topic) total lag (overwatch_resources/groups.py:104-141). */
  def groupTopicLag(wm: DataFrame, go: DataFrame): DataFrame =
    lagRows(wm, go).groupBy(col("cluster"), col("grp"), col("topic"))
      .agg(sum(col("lag")).as("total_lag"), count(lit(1)).as("partitions_with_lag"))

  /** The reference's `groups_df`: name, members, state, eval_elapsed_time,
    * overall_lag (A4: sum over topics, overwatch_resources/groups.py:95). */
  def groupsDf(wm: DataFrame, go: DataFrame, gd: DataFrame): DataFrame = {
    val overall = lagRows(wm, go).groupBy(col("cluster"), col("grp"))
      .agg(sum(col("lag")).as("overall_lag"))
    val elapsed = gd.groupBy(col("cluster"), col("grp"))
      .agg((max(col("scan_ts")) - min(col("scan_ts"))).as("eval_elapsed_time"))
    gd.filter(col("s") === NumScans)
      .join(elapsed, Seq("cluster", "grp"))
      .join(overall, Seq("cluster", "grp"), "left")
      .select(col("cluster"), col("grp").as("name"),
        col("member_count").as("members"), col("state"), col("eval_elapsed_time"),
        coalesce(col("overall_lag"), lit(0L)).as("overall_lag"))
  }
}
