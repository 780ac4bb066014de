package graft.oracle

import graft.sources.Snapshots._

/** DuckDB oracle SQL — a CTE-for-CTE mirror of graft.sources.Snapshots and
  * the graft.operators analytics, runnable by the driver's DuckDB harness
  * against the same raw parquet tables (referenced by bare name:
  * `events`, `documents`, ...).
  *
  * Every expression here must stay semantically identical to its Spark
  * counterpart: integer division uses `//` (DuckDB) vs `div` (Spark), both
  * truncating non-negative values identically; aggregates over BIGINT are
  * CAST back to BIGINT because DuckDB widens sum() to HUGEINT; doubles are
  * produced by the exact same IEEE expression trees on both sides.
  */
object OracleSql {

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  private val injectedTopicsIn =
    InjectedTopics.map(sq).mkString("(", ", ", ")")

  private val wmInjectedValues = InjectedWatermarkRows
    .map { case (t, p, s, lo, hi) => s"(${sq(t)}, $p, $s, $lo, $hi)" }
    .mkString(", ")

  private val goInjectedValues = InjectedGroupOffsetRows
    .map { case (g, t, p, c, s) => s"(${sq(g)}, ${sq(t)}, $p, $c, $s)" }
    .mkString(", ")

  private val gdValues = GroupDimRows
    .map { case (g, st, m, s) => s"(${sq(g)}, ${sq(st)}, $m, $s)" }
    .mkString(", ")

  private val srInjectedValues = SrInjectedRows
    .map { case (r, sub, v, id, tp, str) =>
      s"(${sq(r)}, ${sq(sub)}, $v, $id, ${sq(tp)}, ${sq(str)})" }
    .mkString(", ")

  /** Snapshot-table CTEs (mirror of Snapshots.scala). */
  val snapshotCtes: String = s"""
ev AS (
  SELECT event_id, event_type AS topic, user_id % 4 AS partition_id FROM events),
mx AS (SELECT max(event_id) AS maxid FROM ev),
scans AS (SELECT CAST(s AS BIGINT) AS s FROM (VALUES (1), (2), (3)) t(s)),
wm_pairs AS (SELECT DISTINCT topic, partition_id FROM ev),
wm_cnts AS (
  SELECT topic, partition_id, s, count(*) AS c
  FROM ev, mx, scans WHERE event_id <= (maxid * s) // 3 GROUP BY 1, 2, 3),
wm_derived AS (
  SELECT p.topic, p.partition_id, sc.s, CAST(COALESCE(c.c, 0) AS BIGINT) AS high
  FROM wm_pairs p CROSS JOIN scans sc
  LEFT JOIN wm_cnts c
    ON c.topic = p.topic AND c.partition_id = p.partition_id AND c.s = sc.s),
wm_injected AS (
  SELECT topic, CAST(partition_id AS BIGINT) AS partition_id, CAST(s AS BIGINT) AS s,
         CAST(low AS BIGINT) AS low, CAST(high AS BIGINT) AS high
  FROM (VALUES $wmInjectedValues) t(topic, partition_id, s, low, high)),
watermarks AS (
  SELECT CASE WHEN length(topic) % 2 = 0 THEN 'c1' ELSE 'c2' END AS cluster,
         topic, partition_id, high // 8 AS low, high,
         1700000000 + 60 * s AS scan_ts, s
  FROM wm_derived
  UNION ALL
  SELECT CASE WHEN length(topic) % 2 = 0 THEN 'c1' ELSE 'c2' END,
         topic, partition_id, low, high, 1700000000 + 60 * s, s
  FROM wm_injected),
go_base AS (SELECT * FROM watermarks WHERE topic NOT IN $injectedTopicsIn),
group_offsets AS (
  SELECT cluster, 'g_active' AS grp, topic, partition_id,
         (high * 3) // 4 AS committed, scan_ts, s FROM go_base
  UNION ALL
  SELECT cluster, 'g_empty', topic, partition_id, high // 2, scan_ts, s FROM go_base
  UNION ALL
  SELECT CASE WHEN length(topic) % 2 = 0 THEN 'c1' ELSE 'c2' END,
         grp, topic, CAST(partition_id AS BIGINT), CAST(committed AS BIGINT),
         1700000000 + 60 * CAST(s AS BIGINT), CAST(s AS BIGINT)
  FROM (VALUES $goInjectedValues) t(grp, topic, partition_id, committed, s)),
groups_dim AS (
  SELECT c.cluster, grp, state, CAST(member_count AS BIGINT) AS member_count,
         1700000000 + 60 * CAST(s AS BIGINT) AS scan_ts, CAST(s AS BIGINT) AS s
  FROM (VALUES $gdValues) t(grp, state, member_count, s)
  CROSS JOIN (VALUES ('c1'), ('c2')) c(cluster)),
cfg_topics AS (SELECT DISTINCT cluster, topic FROM watermarks),
cfg_keys AS (SELECT "key" FROM (VALUES ('retention.ms'), ('cleanup.policy'), ('segment.bytes')) t("key")),
topic_configs AS (
  SELECT cluster, topic, "key",
    CASE WHEN "key" = 'retention.ms'
           THEN CASE WHEN length(topic) > 5 THEN '86400000' ELSE '604800000' END
         WHEN "key" = 'cleanup.policy'
           THEN CASE WHEN topic = 'click' THEN 'compact' ELSE 'delete' END
         ELSE '1073741824' END AS "value",
    CASE WHEN "key" = 'retention.ms' THEN length(topic) <= 5
         WHEN "key" = 'cleanup.policy' THEN topic <> 'click'
         ELSE true END AS is_default
  FROM cfg_topics CROSS JOIN cfg_keys),
sr_topics AS (
  SELECT DISTINCT topic FROM watermarks WHERE topic NOT IN $injectedTopicsIn),
sr_derived AS (
  SELECT CASE WHEN length(topic) % 2 = 0 THEN 'sr1' ELSE 'sr2' END AS registry,
         topic || '-value' AS subject, CAST(1 AS BIGINT) AS version,
         1000 + (list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(topic) + 1), i -> CAST(ascii(topic[i:i]) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 1000000007) % 100000) AS schema_id,
         'AVRO' AS schema_type, '{"type":"record","name":"r"}' AS schema_string
  FROM sr_topics),
sr_subjects AS (
  SELECT * FROM sr_derived
  UNION ALL
  SELECT registry, subject, CAST(version AS BIGINT), CAST(schema_id AS BIGINT),
         schema_type, schema_string
  FROM (VALUES $srInjectedValues) t(registry, subject, version, schema_id, schema_type, schema_string))"""

  /** Analytic CTEs (mirror of graft.operators). */
  val analyticCtes: String = s"""
wm_latest AS (SELECT * FROM watermarks WHERE s = $NumScans),
wm_first AS (SELECT * FROM watermarks WHERE s = 1),
tp AS (
  SELECT l.cluster, l.topic, l.partition_id, l.low, l.high, f.high AS init_high
  FROM wm_latest l JOIN wm_first f
    ON l.cluster = f.cluster AND l.topic = f.topic AND l.partition_id = f.partition_id),
topic_msgs AS (
  SELECT cluster, topic, count(*) AS partitions,
         CAST(sum(high - low) AS BIGINT) AS total_messages,
         CAST(sum(high - init_high) AS BIGINT) AS new_messages
  FROM tp GROUP BY 1, 2),
topic_elapsed AS (
  SELECT cluster, topic, max(scan_ts) - min(scan_ts) AS eval_elapsed_time
  FROM watermarks GROUP BY 1, 2),
tg AS (
  SELECT o.cluster, o.topic,
         count(DISTINCT o.grp) AS consumer_groups,
         count(DISTINCT CASE WHEN g.state NOT IN ('DEAD', 'EMPTY')
                              AND g.member_count > 0 THEN o.grp END) AS active_groups
  FROM (SELECT DISTINCT cluster, topic, grp FROM group_offsets) o
  JOIN (SELECT * FROM groups_dim WHERE s = $NumScans) g
    ON o.cluster = g.cluster AND o.grp = g.grp
  GROUP BY 1, 2),
topics_df AS (
  SELECT m.cluster, m.topic AS name, m.partitions, m.total_messages, m.new_messages,
         e.eval_elapsed_time,
         COALESCE(tg.consumer_groups, 0) AS consumer_groups,
         COALESCE(tg.active_groups, 0) AS active_groups,
         COALESCE(CASE WHEN e.eval_elapsed_time = 0 THEN NULL
                       ELSE m.new_messages // e.eval_elapsed_time END, 0)
           AS messages_per_seconds
  FROM topic_msgs m
  JOIN topic_elapsed e ON m.cluster = e.cluster AND m.topic = e.topic
  LEFT JOIN tg ON m.cluster = tg.cluster AND m.topic = tg.topic),
lag_rows AS (
  SELECT o.cluster, o.grp, o.topic, o.partition_id, w.high - o.committed AS "lag"
  FROM (SELECT * FROM group_offsets WHERE s = $NumScans) o
  JOIN wm_latest w
    ON o.cluster = w.cluster AND o.topic = w.topic AND o.partition_id = w.partition_id
  WHERE w.high - w.low > 0 AND o.committed >= 0),
group_overall AS (
  SELECT cluster, grp, CAST(sum("lag") AS BIGINT) AS overall_lag
  FROM lag_rows GROUP BY 1, 2),
group_elapsed AS (
  SELECT cluster, grp, max(scan_ts) - min(scan_ts) AS eval_elapsed_time
  FROM groups_dim GROUP BY 1, 2),
groups_df AS (
  SELECT g.cluster, g.grp AS name, g.member_count AS members, g.state,
         e.eval_elapsed_time, COALESCE(o.overall_lag, 0) AS overall_lag
  FROM (SELECT * FROM groups_dim WHERE s = $NumScans) g
  JOIN group_elapsed e ON g.cluster = e.cluster AND g.grp = e.grp
  LEFT JOIN group_overall o ON g.cluster = o.cluster AND g.grp = o.grp),
w_total AS (SELECT count(*) AS total FROM topics_df)"""

  val base: String = s"WITH $snapshotCtes,\n$analyticCtes"

  private def wasteCat(category: String, pred: String): String = s"""
  SELECT '$category' AS category, count(*) AS topics_count,
         CAST(COALESCE(sum(partitions), 0) AS BIGINT) AS topic_partitions_sum
  FROM topics_df WHERE $pred"""

  val wastePreds: Map[String, String] = Map(
    "empty" -> "total_messages = 0",
    "dead_weight" -> "total_messages = 0 AND partitions > 1 AND active_groups = 0",
    "stale" -> "total_messages > 0 AND new_messages = 0 AND active_groups = 0")

  /** Governance regex lists must match graft.operators.Governance defaults. */
  private val govTopic = ("'^[a-z]+$'", "'^t_empty'")
  private val govGroup = ("'^[a-z]+$'", "'^g_dead'")

  private def govCtes(src: String, re: (String, String)): String = s"""
gov AS (
  SELECT name, regexp_matches(name, ${re._2}) AS excluded_name,
         regexp_matches(name, ${re._1}) AS compliant_name
  FROM $src)"""

  /** The oracle queries, keyed identically to SparkEntry.queries. */
  val queries: Map[String, String] = Map(
    "q_topics_stats" ->
      s"$base SELECT cluster, name, partitions, total_messages, new_messages, eval_elapsed_time, consumer_groups, active_groups, messages_per_seconds FROM topics_df ORDER BY name",
    "q_groups_stats" ->
      s"$base SELECT cluster, name, members, state, eval_elapsed_time, overall_lag FROM groups_df ORDER BY name",
    "q_lag_partition" ->
      s"""$base SELECT cluster, grp, topic, partition_id, "lag" FROM lag_rows ORDER BY grp, topic, partition_id""",
    "q_lag_topic" ->
      s"""$base SELECT cluster, grp, topic, CAST(sum("lag") AS BIGINT) AS total_lag, count(*) AS partitions_with_lag FROM lag_rows GROUP BY 1, 2, 3 ORDER BY grp, topic""",
    // mirror of GroupAnalytics.lagPercentiles (exact percentiles ==
    // quantile_cont, the established parity)
    "q_lag_percentiles" ->
      s"""$base SELECT cluster, grp, count(*) AS partitions,
       quantile_cont("lag", 0.5) AS p50_lag,
       quantile_cont("lag", 0.9) AS p90_lag,
       CAST(max("lag") AS BIGINT) AS max_lag
FROM lag_rows GROUP BY 1, 2 ORDER BY grp""",
    // mirror of GroupAnalytics.lagTrend: exact-integer least squares over
    // the per-scan lag series (the one double division is at the end)
    "q_lag_trend" ->
      s"""$base, lag_scan AS (
  SELECT o.cluster, o.grp, o.topic, o.s,
         CAST(sum(w.high - o.committed) AS BIGINT) AS lag
  FROM group_offsets o JOIN watermarks w
    ON o.cluster = w.cluster AND o.topic = w.topic
   AND o.partition_id = w.partition_id AND o.s = w.s
  WHERE o.committed >= 0 AND w.high - w.low > 0
  GROUP BY 1, 2, 3, 4),
tr AS (
  SELECT cluster, grp, topic, count(*) AS n,
         CAST(sum(s) AS BIGINT) AS sx, CAST(sum(lag) AS BIGINT) AS sy,
         CAST(sum(s * s) AS BIGINT) AS sxx, CAST(sum(s * lag) AS BIGINT) AS sxy
  FROM lag_scan GROUP BY 1, 2, 3)
SELECT cluster, grp, topic, n AS scans,
       CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
       CASE WHEN n * sxy - sx * sy > 0 THEN 'growing'
            WHEN n * sxy - sx * sy < 0 THEN 'shrinking'
            ELSE 'flat' END AS trend
FROM tr WHERE n >= 2 ORDER BY grp, topic""",
    "q_waste_summary" -> (base + ", waste_summary AS (" +
      wastePreds.toSeq.sortBy(_._1).map { case (c, p) => wasteCat(c, p) }.mkString(" UNION ALL ") +
      ") SELECT category, topics_count, topic_partitions_sum, CASE WHEN total = 0 THEN NULL ELSE (topics_count * 100) // total END AS cluster_percentage FROM waste_summary, w_total ORDER BY category"),
    "q_waste_detail" -> (base + " " +
      wastePreds.toSeq.sortBy(_._1).map { case (c, p) =>
        s"SELECT '$c' AS category, name, partitions FROM topics_df WHERE $p" }
        .mkString(" UNION ALL ") + " ORDER BY category, name"),
    "q_most_active" ->
      s"""$base, q AS (
  SELECT quantile_cont(new_messages, 0.75) AS q_new,
         quantile_cont(total_messages, 0.75) AS q_total FROM topics_df)
SELECT cluster, name, partitions, total_messages, new_messages, active_groups
FROM topics_df, q
WHERE new_messages > q_new AND total_messages > q_total AND active_groups > 0
ORDER BY name""",
    "q_cluster_totals" ->
      s"""$base SELECT t.cluster, t.topics_count, t.partitions_count, g.consumer_groups_count
FROM (SELECT cluster, count(DISTINCT topic) AS topics_count, count(*) AS partitions_count
      FROM wm_latest GROUP BY 1) t
JOIN (SELECT cluster, count(DISTINCT grp) AS consumer_groups_count
      FROM groups_dim WHERE s = $NumScans GROUP BY 1) g ON t.cluster = g.cluster""",
    "q_topic_flags" ->
      s"$base SELECT cluster, name, new_messages > 0 AS has_new_messages, active_groups > 0 AS has_active_groups FROM topics_df ORDER BY name",
    "q_governance_topics" ->
      s"$base, ${govCtes("topics_df", govTopic)} SELECT name, excluded_name, compliant_name FROM gov ORDER BY name",
    "q_governance_summary" ->
      s"""$base, ${govCtes("topics_df", govTopic)}
SELECT count(*) AS total,
       CAST(sum(CASE WHEN excluded_name THEN 1 ELSE 0 END) AS BIGINT) AS excluded_count,
       CAST(sum(CASE WHEN NOT compliant_name AND NOT excluded_name THEN 1 ELSE 0 END) AS BIGINT) AS non_compliant_count,
       100.0 - CAST(sum(CASE WHEN NOT compliant_name AND NOT excluded_name THEN 1 ELSE 0 END) AS BIGINT) * 100.0
         / nullif(count(*) - CAST(sum(CASE WHEN excluded_name THEN 1 ELSE 0 END) AS BIGINT), 0) AS compliant_percentage
FROM gov""",
    "q_governance_noncompliant" ->
      s"$base, ${govCtes("topics_df", govTopic)} SELECT name FROM gov WHERE NOT compliant_name AND NOT excluded_name ORDER BY name",
    "q_governance_groups" ->
      s"$base, ${govCtes("groups_df", govGroup)} SELECT name, excluded_name, compliant_name FROM gov ORDER BY name",
    "q_sr_unused" ->
      s"""$base, sru AS (
  SELECT registry, subject, version, schema_id, schema_type,
         replace(replace(subject, '-value', ''), '-key', '') AS base_name
  FROM sr_subjects)
SELECT registry, subject, version, schema_id, schema_type FROM sru
WHERE base_name NOT IN (SELECT DISTINCT topic FROM wm_latest)
ORDER BY subject""",
    "q_sr_counts" ->
      s"""$base, sru AS (
  SELECT registry, subject,
         replace(replace(subject, '-value', ''), '-key', '') AS base_name
  FROM sr_subjects)
SELECT s.registry, count(DISTINCT s.subject) AS subjects_count,
       count(DISTINCT s.schema_id) AS schemas_count,
       COALESCE(u.unused_subjects_count, 0) AS unused_subjects_count
FROM sr_subjects s
LEFT JOIN (SELECT registry, count(DISTINCT subject) AS unused_subjects_count
           FROM sru WHERE base_name NOT IN (SELECT DISTINCT topic FROM wm_latest)
           GROUP BY 1) u ON s.registry = u.registry
GROUP BY s.registry, u.unused_subjects_count""",
    "q_topic_churn" ->
      s"""$base, present AS (SELECT DISTINCT cluster, topic, s FROM watermarks),
prev_shifted AS (SELECT cluster, topic, s + 1 AS s FROM present)
SELECT cluster, s, change, topic FROM (
  SELECT p.cluster, p.s, 'deleted' AS change, p.topic
  FROM prev_shifted p WHERE p.s <= $NumScans AND NOT EXISTS (
    SELECT 1 FROM present c
    WHERE c.cluster = p.cluster AND c.topic = p.topic AND c.s = p.s)
  UNION ALL
  SELECT c.cluster, c.s, 'added', c.topic FROM present c WHERE c.s > 1 AND NOT EXISTS (
    SELECT 1 FROM prev_shifted p
    WHERE p.cluster = c.cluster AND p.topic = c.topic AND p.s = c.s))
ORDER BY s, change, topic""",
    "q_sr_backup_index" ->
      s"""$base SELECT subject || '::' || version || '::' || schema_type || '::' || schema_id || '.txt' AS file_name,
       registry, subject, version, schema_id, schema_type, schema_string
FROM sr_subjects ORDER BY file_name""",
    "q_partition_deltas" ->
      s"""$base SELECT cluster, topic, partition_id, scan_ts, high - prev_high AS delta
FROM (SELECT cluster, topic, partition_id, scan_ts, high,
             lag(high, 1) OVER (PARTITION BY cluster, topic, partition_id ORDER BY s) AS prev_high
      FROM watermarks)
WHERE prev_high IS NOT NULL
ORDER BY topic, partition_id, scan_ts""",
    "q_baseline_deltas" ->
      s"""$base SELECT cluster, topic, partition_id, scan_ts,
       high - first_value(high) OVER (PARTITION BY cluster, topic, partition_id ORDER BY s
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS messages_since_start
FROM watermarks ORDER BY topic, partition_id, scan_ts""",
    "q_log_start" ->
      s"""$base SELECT cluster, topic, partition_id, max(low) AS first_offset,
       max(low) > min(low) AS retention_moved
FROM watermarks GROUP BY 1, 2, 3 ORDER BY topic, partition_id""",
    "q_topic_configs" ->
      s"""$base SELECT cluster, topic, "key", "value" FROM topic_configs
WHERE NOT is_default ORDER BY topic, "key"""",
    "q_dr_commands" ->
      s"""$base, parts AS (
  SELECT cluster, topic, count(*) AS partitions FROM wm_latest GROUP BY 1, 2),
flags AS (
  SELECT cluster, topic,
         string_agg(' --config ' || "key" || '=' || "value", '' ORDER BY "key") AS config_flags
  FROM topic_configs WHERE NOT is_default GROUP BY 1, 2)
SELECT p.cluster, p.topic,
       'kafka-topics.sh --create --topic ' || p.topic || ' --partitions ' || p.partitions
         || COALESCE(f.config_flags, '') AS command
FROM parts p LEFT JOIN flags f ON p.cluster = f.cluster AND p.topic = f.topic
ORDER BY p.topic""",
    "q_cluster_report" ->
      s"""$base,
q AS (SELECT quantile_cont(new_messages, 0.75) AS q_new,
             quantile_cont(total_messages, 0.75) AS q_total FROM topics_df),
tgov AS (
  SELECT count(*) AS cnt,
         CAST(sum(CASE WHEN regexp_matches(name, ${govTopic._2}) THEN 1 ELSE 0 END) AS BIGINT) AS excl,
         CAST(sum(CASE WHEN NOT regexp_matches(name, ${govTopic._1})
                        AND NOT regexp_matches(name, ${govTopic._2}) THEN 1 ELSE 0 END) AS BIGINT) AS nc
  FROM topics_df),
ggov AS (
  SELECT count(*) AS cnt,
         CAST(sum(CASE WHEN regexp_matches(name, ${govGroup._2}) THEN 1 ELSE 0 END) AS BIGINT) AS excl,
         CAST(sum(CASE WHEN NOT regexp_matches(name, ${govGroup._1})
                        AND NOT regexp_matches(name, ${govGroup._2}) THEN 1 ELSE 0 END) AS BIGINT) AS nc
  FROM groups_df),
wc AS (
  SELECT count(*) AS t_total, CAST(sum(partitions) AS BIGINT) AS t_partitions,
         CAST(sum(CASE WHEN total_messages = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_topics,
         CAST(COALESCE(sum(CASE WHEN total_messages = 0 THEN partitions END), 0) AS BIGINT) AS empty_parts,
         CAST(sum(CASE WHEN total_messages = 0 AND partitions > 1 AND active_groups = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dw_topics,
         CAST(COALESCE(sum(CASE WHEN total_messages = 0 AND partitions > 1 AND active_groups = 0 THEN partitions END), 0) AS BIGINT) AS dw_parts,
         CAST(sum(CASE WHEN total_messages > 0 AND new_messages = 0 AND active_groups = 0 THEN 1 ELSE 0 END) AS BIGINT) AS stale_topics,
         CAST(COALESCE(sum(CASE WHEN total_messages > 0 AND new_messages = 0 AND active_groups = 0 THEN partitions END), 0) AS BIGINT) AS stale_parts
  FROM topics_df),
cg AS (
  SELECT count(*) AS cg_total,
         CAST(sum(CASE WHEN overall_lag = 0 AND members > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cg_active,
         CAST(sum(CASE WHEN overall_lag > 0 OR members = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cg_inactive
  FROM groups_df),
ma AS (
  SELECT count(*) AS most_active_count FROM topics_df, q
  WHERE new_messages > q_new AND total_messages > q_total AND active_groups > 0),
sr AS (SELECT count(DISTINCT subject) AS subjects_count,
              count(DISTINCT schema_id) AS schemas_count FROM sr_subjects),
un AS (
  SELECT count(DISTINCT subject) AS detected_unused_count
  FROM (SELECT subject, replace(replace(subject, '-value', ''), '-key', '') AS base_name
        FROM sr_subjects)
  WHERE base_name NOT IN (SELECT DISTINCT topic FROM wm_latest))
SELECT 'c1' AS cluster_name, '2023-11-14T22:16:20.000000' AS report_ts,
       wc.t_total AS topics, wc.t_partitions AS partitions,
       cg.cg_total, cg.cg_active, cg.cg_inactive,
       ma.most_active_count,
       wc.empty_topics + wc.dw_topics + wc.stale_topics AS waste_topics,
       wc.empty_parts + wc.dw_parts + wc.stale_parts AS waste_partitions,
       wc.empty_topics,
       CASE WHEN wc.t_total = 0 THEN NULL
            ELSE CAST((wc.empty_topics * 100) // wc.t_total AS DOUBLE) END AS empty_pct,
       wc.dw_topics AS dead_weight_topics, wc.stale_topics AS stale_topics,
       CAST(tgov.cnt AS DOUBLE) AS t_gov_total, CAST(tgov.excl AS DOUBLE) AS t_gov_ignored,
       CAST(tgov.cnt - tgov.excl AS DOUBLE) AS t_gov_measured,
       100.0 - tgov.nc * 100.0 / nullif(tgov.cnt - tgov.excl, 0) AS t_gov_pct,
       100.0 - ggov.nc * 100.0 / nullif(ggov.cnt - ggov.excl, 0) AS g_gov_pct,
       sr.subjects_count, sr.schemas_count, un.detected_unused_count
FROM wc, cg, ma, tgov, ggov, sr, un""",
    "q_describe_stats" ->
      s"""$base, num AS (
  SELECT 'total_messages' AS "column", count(*) AS cnt,
         CAST(sum(total_messages) AS BIGINT) AS sx,
         CAST(sum(total_messages * total_messages) AS BIGINT) AS sxx,
         CAST(min(total_messages) AS DOUBLE) AS min_v,
         quantile_cont(total_messages, 0.25) AS q25,
         quantile_cont(total_messages, 0.5) AS q50,
         quantile_cont(total_messages, 0.75) AS q75,
         CAST(max(total_messages) AS DOUBLE) AS max_v
  FROM topics_df
  UNION ALL
  SELECT 'new_messages', count(*),
         CAST(sum(new_messages) AS BIGINT), CAST(sum(new_messages * new_messages) AS BIGINT),
         CAST(min(new_messages) AS DOUBLE),
         quantile_cont(new_messages, 0.25), quantile_cont(new_messages, 0.5),
         quantile_cont(new_messages, 0.75), CAST(max(new_messages) AS DOUBLE)
  FROM topics_df)
SELECT "column", cnt,
       CAST(sx AS DOUBLE) / cnt AS mean,
       sqrt(greatest((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / cnt) / (cnt - 1), 0.0)) AS std,
       min_v, q25, q50, q75, max_v
FROM num ORDER BY "column"""")
}
