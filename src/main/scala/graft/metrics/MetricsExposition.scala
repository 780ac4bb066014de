package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prometheus-style metric surface (K4 / SURVEY §2.8): the reference's
  * gauge/summary catalog (kafka_overwatch/monitoring/prometheus.py:7-75)
  * fed by the engine's metric queries and rendered in the text exposition
  * format (a public, dependency-free contract). A caller exposes the
  * string over HTTP; the engine's job ends at the document.
  */
object MetricsExposition {

  private def esc(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** One gauge family from a DataFrame: label columns + one value column. */
  def gauge(name: String, help: String, df: DataFrame,
            labels: Seq[String], value: String): String = {
    val rows = df.select((labels :+ value).map(col): _*).collect()
    val lines = rows.map { r =>
      val ls = labels.zipWithIndex
        .map { case (l, i) => s"""$l="${esc(String.valueOf(r.get(i)))}"""" }
        .mkString(",")
      val v = r.get(labels.size) match {
        case null => "NaN"
        case n: Number => n.toString
        case other => other.toString
      }
      if (ls.isEmpty) s"$name $v" else s"$name{$ls} $v"
    }
    (s"# HELP $name $help" +: s"# TYPE $name gauge" +: lines).mkString("\n")
  }

  /** Prometheus Summary exposition (count + sum), the format of the
    * reference's collector-latency metrics
    * (kafka_overwatch/monitoring/prometheus.py:17-28). */
  def summary(name: String, help: String, labels: Seq[(String, String)],
              count: Long, sum: Double): String = {
    val ls = labels.map { case (k, v) => s"""$k="${esc(v)}"""" }.mkString(",")
    val lbl = if (ls.isEmpty) "" else s"{$ls}"
    Seq(s"# HELP $name $help", s"# TYPE $name summary",
      s"${name}_count$lbl $count", s"${name}_sum$lbl $sum").mkString("\n")
  }

  /** The reference's full cluster gauge catalog in one exposition document:
    * cluster totals (A5), per-(group, topic) lag (A3), SR counts (A11),
    * per-partition new-message deltas (W1, exposed as a gauge of the last
    * interval). */
  def exposition(clusterTotals: DataFrame, groupTopicLag: DataFrame,
                 srCounts: DataFrame, partitionDeltas: DataFrame,
                 lagTrend: Option[DataFrame] = None): String = {
    val latestDelta = partitionDeltas
      .groupBy(col("cluster"), col("topic"), col("partition_id"))
      .agg(max_by(col("delta"), col("scan_ts")).as("delta"))
    // beyond the reference's catalog: the lag-trend slope (exact-integer
    // least squares over the scan history, GroupAnalytics.lagTrend) —
    // the alertable is-it-falling-behind signal
    val trendGauge = lagTrend.map(t =>
      gauge("kafka_overwatch_consumer_group_lag_slope",
        "Lag least-squares slope over the scan history (positive = falling behind)",
        t, Seq("cluster", "grp", "topic"), "slope")).toSeq
    (Seq(
      gauge("kafka_overwatch_cluster_topics_count", "Total topics per cluster",
        clusterTotals, Seq("cluster"), "topics_count"),
      gauge("kafka_overwatch_cluster_partitions_count", "Total partitions per cluster",
        clusterTotals, Seq("cluster"), "partitions_count"),
      gauge("kafka_overwatch_cluster_consumer_groups_count", "Total consumer groups per cluster",
        clusterTotals, Seq("cluster"), "consumer_groups_count"),
      gauge("kafka_overwatch_consumer_group_lag", "Total lag per group and topic",
        groupTopicLag, Seq("cluster", "grp", "topic"), "total_lag"),
      gauge("kafka_overwatch_subjects_count", "Schema registry subjects",
        srCounts, Seq("registry"), "subjects_count"),
      gauge("kafka_overwatch_schemas_count", "Schema registry schemas",
        srCounts, Seq("registry"), "schemas_count"),
      gauge("kafka_overwatch_topic_partition_new_messages", "New messages in the last scan interval",
        latestDelta, Seq("cluster", "topic", "partition_id"), "delta"))
      ++ trendGauge)
      .mkString("\n") + "\n"
  }
}
