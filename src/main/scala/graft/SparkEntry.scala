package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Snapshots
import graft.operators._
import graft.oracle.OracleSql

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2 expressed as a
  * DataFrame pipeline over the driver parquet tables (via the deterministic
  * snapshot fixtures in graft.sources.Snapshots); `oracleSql` carries the
  * byte-equivalent DuckDB SQL from graft.oracle.OracleSql.
  */
object SparkEntry {

  /** Flagship query on sf=0.001: the reference's topics_df (its central
    * analytic table). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    topicsDf(spark, "/root/testdata/sf0.001")

  private def topicsDf(s: SparkSession, dir: String): DataFrame =
    TopicAnalytics.topicsDf(Snapshots.watermarks(s, dir),
      Snapshots.groupOffsets(s, dir), Snapshots.groupsDim(s, dir))

  private def groupsDfOf(s: SparkSession, dir: String): DataFrame =
    GroupAnalytics.groupsDf(Snapshots.watermarks(s, dir),
      Snapshots.groupOffsets(s, dir), Snapshots.groupsDim(s, dir))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topics_stats" -> ((s, dir) =>
      topicsDf(s, dir).orderBy(col("name"))),
    "q_groups_stats" -> ((s, dir) =>
      groupsDfOf(s, dir).orderBy(col("name"))),
    "q_lag_partition" -> ((s, dir) =>
      GroupAnalytics.lagRows(Snapshots.watermarks(s, dir), Snapshots.groupOffsets(s, dir))
        .orderBy(col("grp"), col("topic"), col("partition_id"))),
    "q_lag_topic" -> ((s, dir) =>
      GroupAnalytics.groupTopicLag(Snapshots.watermarks(s, dir), Snapshots.groupOffsets(s, dir))
        .orderBy(col("grp"), col("topic"))),
    "q_waste_summary" -> ((s, dir) =>
      TopicAnalytics.wasteSummary(topicsDf(s, dir)).orderBy(col("category"))),
    "q_waste_detail" -> ((s, dir) =>
      TopicAnalytics.wasteDetail(topicsDf(s, dir)).orderBy(col("category"), col("name"))),
    "q_most_active" -> ((s, dir) =>
      TopicAnalytics.mostActive(topicsDf(s, dir)).orderBy(col("name"))),
    "q_cluster_totals" -> ((s, dir) =>
      TopicAnalytics.clusterTotals(Snapshots.watermarks(s, dir), Snapshots.groupsDim(s, dir))),
    "q_governance_topics" -> ((s, dir) =>
      Governance.governed(topicsDf(s, dir)).orderBy(col("name"))),
    "q_governance_summary" -> ((s, dir) =>
      Governance.summary(topicsDf(s, dir))),
    "q_governance_noncompliant" -> ((s, dir) =>
      Governance.nonCompliant(topicsDf(s, dir)).orderBy(col("name"))),
    "q_governance_groups" -> ((s, dir) =>
      Governance.governed(groupsDfOf(s, dir),
        compliant = Seq("^[a-z]+$"), excluded = Seq("^g_dead")).orderBy(col("name"))),
    "q_sr_unused" -> ((s, dir) =>
      SchemaRegistryOps.unusedSubjects(Snapshots.srSubjects(s, dir),
        Snapshots.watermarks(s, dir)).orderBy(col("subject"))),
    "q_sr_counts" -> ((s, dir) =>
      SchemaRegistryOps.counts(Snapshots.srSubjects(s, dir), Snapshots.watermarks(s, dir))),
    "q_partition_deltas" -> ((s, dir) =>
      Deltas.partitionDeltas(Snapshots.watermarks(s, dir))
        .orderBy(col("topic"), col("partition_id"), col("scan_ts"))),
    "q_baseline_deltas" -> ((s, dir) =>
      Deltas.baselineDeltas(Snapshots.watermarks(s, dir))
        .orderBy(col("topic"), col("partition_id"), col("scan_ts"))),
    "q_log_start" -> ((s, dir) =>
      Deltas.logStart(Snapshots.watermarks(s, dir))
        .orderBy(col("topic"), col("partition_id"))),
    "q_topic_configs" -> ((s, dir) =>
      ConfigOps.nonDefaultConfigs(Snapshots.topicConfigs(s, dir))
        .orderBy(col("topic"), col("key"))),
    "q_dr_commands" -> ((s, dir) =>
      ConfigOps.drCommands(Snapshots.watermarks(s, dir), Snapshots.topicConfigs(s, dir))
        .orderBy(col("topic"))),
    "q_describe_stats" -> ((s, dir) =>
      TopicAnalytics.describeStats(topicsDf(s, dir)).orderBy(col("column"))))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.queries
}
