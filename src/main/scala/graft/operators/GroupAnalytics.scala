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

  /** Lag TREND per (cluster, group, topic): per-scan total lag regressed
    * against the scan index — the monitoring question the reference's
    * single-scan lag join cannot answer: is this group falling behind,
    * catching up, or holding?
    *
    * The least-squares slope is computed from EXACT integer sums
    * (n·Σsy − Σs·Σy) / (n·Σs² − (Σs)²): every accumulator is a BIGINT
    * (order-free on any partitioning); the single double division at
    * the end is deterministic on every engine. Same P12 guards as
    * lagRows, applied per scan. Two shuffles: the per-scan lag
    * aggregation and the per-series regression aggregation (one key
    * prefix apart); the watermark side broadcasts as in lagRows. */
  def lagTrend(wm: DataFrame, go: DataFrame): DataFrame = {
    val perScan = go.filter(col("committed") >= 0)
      .join(broadcast(wm.select(col("cluster"), col("topic"),
        col("partition_id"), col("s"), col("low"), col("high"))),
        Seq("cluster", "topic", "partition_id", "s"))
      .filter(col("high") - col("low") > 0)
      .groupBy(col("cluster"), col("grp"), col("topic"), col("s"))
      .agg(sum(col("high") - col("committed")).as("lag"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    perScan.groupBy(col("cluster"), col("grp"), col("topic"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("sx"), sum(col("lag")).as("sy"),
        sum(col("s") * col("s")).as("sxx"), sum(col("s") * col("lag")).as("sxy"))
      .filter(col("n") >= 2)
      .select(col("cluster"), col("grp"), col("topic"), col("n").as("scans"),
        (num.cast("double") / den.cast("double")).as("slope"),
        when(num > 0, "growing").when(num < 0, "shrinking")
          .otherwise("flat").as("trend"))
  }

  /** Per-group lag DISTRIBUTION at the latest scan: partition count and
    * exact p50/p90/max lag — the shape alerting actually wants (one hot
    * partition hides inside a healthy total). Exact percentiles are
    * order-free; [[graft.functions.AtScale]] switches them to the
    * bounded-state percentile_approx under the at-scale session conf. */
  def lagPercentiles(wm: DataFrame, go: DataFrame): DataFrame =
    lagRows(wm, go).groupBy(col("cluster"), col("grp"))
      .agg(count(lit(1)).as("partitions"),
        graft.functions.AtScale.quantile(wm, col("lag"), 0.5).as("p50_lag"),
        graft.functions.AtScale.quantile(wm, col("lag"), 0.9).as("p90_lag"),
        max(col("lag")).as("max_lag"))

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
