package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Snapshots.NumScans

/** Topic-level analytics: the reference's `topics_df` and its waste /
  * most-active report fragments.
  *
  * Reference: topics_df built at
  * kafka_overwatch/overwatch_resources/clusters.py:315-329 from row dicts at
  * overwatch_resources/topics.py:158-172; waste categories at
  * reporting/topics.py:17-111; most-active at reporting/__init__.py:37-51.
  *
  * All functions are pure DataFrame -> DataFrame transforms over the
  * snapshot tables (graft.sources.Snapshots), so Catalyst sees one
  * declarative plan per report: filters push into the parquet scan,
  * group-bys run as partial+final hash aggregates, and the small dimension
  * joins broadcast. At 100 TB (large fleet x long history) the only
  * shuffles are the per-(cluster,topic) aggregations, which are
  * prefix-partitioned by the snapshot layout.
  */
object TopicAnalytics {

  /** The reference's `topics_df`: one row per (cluster, topic) with
    * partitions, total_messages, new_messages, eval_elapsed_time,
    * consumer_groups, active_groups, messages_per_seconds.
    *
    * - total_messages = sum over partitions of (high - low) at the latest
    *   scan (Partition.total_messages, overwatch_resources/topics.py:102-106).
    * - new_messages = sum of (high - high at first scan) (A2,
    *   overwatch_resources/topics.py:108-115).
    * - eval_elapsed_time = max(scan_ts) - min(scan_ts) per topic — fixes
    *   quirk Q2 (reference reads partition 0's clock only,
    *   overwatch_resources/topics.py:210-216).
    * - messages_per_seconds = new/elapsed, int-truncated, null->0 (P1/F3,
    *   overwatch_resources/clusters.py:322-327).
    */
  def topicsDf(wm: DataFrame, go: DataFrame, gd: DataFrame): DataFrame = {
    val wLatest = wm.filter(col("s") === NumScans)
    val wFirst  = wm.filter(col("s") === 1)
    val part = wLatest.alias("l")
      .join(wFirst.alias("f"), Seq("cluster", "topic", "partition_id"))
      .select(col("cluster"), col("topic"), col("partition_id"),
        col("l.low").as("low"), col("l.high").as("high"),
        col("f.high").as("init_high"))
    val msgs = part.groupBy(col("cluster"), col("topic")).agg(
      count(lit(1)).as("partitions"),
      sum(col("high") - col("low")).as("total_messages"),
      sum(col("high") - col("init_high")).as("new_messages"))
    val elapsed = wm.groupBy(col("cluster"), col("topic"))
      .agg((max(col("scan_ts")) - min(col("scan_ts"))).as("eval_elapsed_time"))
    val tg = topicGroupCounts(go, gd)
    msgs.join(elapsed, Seq("cluster", "topic"))
      .join(tg, Seq("cluster", "topic"), "left")
      .select(col("cluster"), col("topic").as("name"), col("partitions"),
        col("total_messages"), col("new_messages"), col("eval_elapsed_time"),
        coalesce(col("consumer_groups"), lit(0L)).as("consumer_groups"),
        coalesce(col("active_groups"), lit(0L)).as("active_groups"),
        coalesce(when(col("eval_elapsed_time") === 0, lit(null))
          .otherwise(expr("new_messages div eval_elapsed_time")), lit(0L))
          .as("messages_per_seconds"))
  }

  /** J3: per-topic consumer_groups / active_groups counts.
    * Reference back-links at overwatch_resources/topics.py:166-171,193-198;
    * is_active at overwatch_resources/groups.py:79-85. */
  def topicGroupCounts(go: DataFrame, gd: DataFrame): DataFrame = {
    val distinctTG = go.select(col("cluster"), col("topic"), col("grp")).distinct()
    val gLatest = gd.filter(col("s") === NumScans)
      .withColumn("is_active",
        !col("state").isin("DEAD", "EMPTY") && col("member_count") > 0)
      .select(col("cluster"), col("grp"), col("is_active"))
    distinctTG.join(broadcast(gLatest), Seq("cluster", "grp"))
      .groupBy(col("cluster"), col("topic"))
      .agg(countDistinct(col("grp")).as("consumer_groups"),
        countDistinct(when(col("is_active"), col("grp"))).as("active_groups"))
  }

  /** A12: explicit existence aggregates per topic — has_new_messages =
    * any partition advanced since baseline, has_active_groups = any
    * attached group is active (reference Topic.has_* methods,
    * overwatch_resources/topics.py:117-121,193-204). */
  def topicFlags(wm: DataFrame, go: DataFrame, gd: DataFrame): DataFrame =
    topicsDf(wm, go, gd).select(col("cluster"), col("name"),
      (col("new_messages") > 0).as("has_new_messages"),
      (col("active_groups") > 0).as("has_active_groups"))

  /** Waste-category predicates (reporting/topics.py:23-28, 43-47, 83-87). */
  val emptyPred: Column =
    col("total_messages") === 0
  val deadWeightPred: Column =
    col("total_messages") === 0 && col("partitions") > 1 && col("active_groups") === 0
  val stalePred: Column =
    col("total_messages") > 0 && col("new_messages") === 0 && col("active_groups") === 0

  /** A7: one waste-category summary row: topics_count, topic_partitions_sum,
    * cluster_percentage (int-truncated, reporting/topics.py:35-38 — computed
    * as exact integer division count*100 div total in both engines). */
  def wasteCategory(topics: DataFrame, pred: Column, category: String): DataFrame = {
    val total = topics.agg(count(lit(1)).as("total"))
    topics.filter(pred)
      .agg(count(lit(1)).as("topics_count"),
        coalesce(sum(col("partitions")), lit(0L)).as("topic_partitions_sum"))
      .crossJoin(total)
      .select(lit(category).as("category"), col("topics_count"),
        col("topic_partitions_sum"),
        when(col("total") === 0, lit(null))
          .otherwise(expr("topics_count * 100 div total"))
          .as("cluster_percentage"))
  }

  /** All three waste categories as one 3-row summary — computed in ONE
    * pass over `topics`: each category is a conditional aggregate next
    * to the shared total, and the three rows come from exploding a
    * 3-struct array over the single 1-row aggregate. The previous form
    * (three wasteCategory unions, each a filter-agg crossJoined with
    * its own total agg) planned SIX independent scans of `topics`; when
    * the cached table's blocks are cold each AQE subquery re-derives it
    * concurrently — measured 55.6 s task time / 5.95 s wall in-bench at
    * sf0.1 vs ~0.3 s for this shape. Same aggregate semantics:
    * count(when(pred,1)) == count over filter(pred), the partition sum
    * coalesces to 0 on an empty category, and the percentage stays the
    * exact int-truncated division (null when the table is empty). */
  def wasteSummary(topics: DataFrame): DataFrame = {
    val cats = Seq(("empty", emptyPred), ("dead_weight", deadWeightPred),
      ("stale", stalePred))
    val aggs = count(lit(1)).as("total") +: cats.zipWithIndex.flatMap {
      case ((_, pred), i) =>
        Seq(count(when(pred, 1)).as(s"c$i"),
          coalesce(sum(when(pred, col("partitions"))), lit(0L)).as(s"p$i"))
    }
    val rows = cats.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("category"),
        col(s"c$i").as("topics_count"),
        col(s"p$i").as("topic_partitions_sum"),
        when(col("total") === 0, lit(null).cast("long"))
          .otherwise(expr(s"c$i * 100 div total")).as("cluster_percentage"))
    }
    topics.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("w"))
      .select(col("w.category").as("category"),
        col("w.topics_count").as("topics_count"),
        col("w.topic_partitions_sum").as("topic_partitions_sum"),
        col("w.cluster_percentage").as("cluster_percentage"))
  }

  /** Per-topic membership rows for each waste category (the reference keeps
    * a name->partitions map per category, reporting/topics.py:24-28).
    * One pass: the categories a topic belongs to are a row-local array
    * (categories overlap — empty ⊂ dead_weight's predicate — so a topic
    * can emit several rows, exactly the old three-filter union's rows);
    * the previous three-filter union planned three scans of `topics`. */
  def wasteDetail(topics: DataFrame): DataFrame =
    topics.select(col("name"), col("partitions"),
        explode(filter(array(
          when(emptyPred, lit("empty")),
          when(deadWeightPred, lit("dead_weight")),
          when(stalePred, lit("stale"))), x => x.isNotNull)).as("category"))
      .select(col("category"), col("name"), col("partitions"))

  /** P6/A6/A9: topics above the 75th percentile of both new_messages and
    * total_messages with at least one active group
    * (reporting/__init__.py:37-51). `percentile` is exact linear
    * interpolation — same definition as pandas Series.quantile and DuckDB
    * quantile_cont; switch to percentile_approx at 100 TB scale. */
  def mostActive(topics: DataFrame): DataFrame = {
    val q = topics.agg(
      graft.functions.AtScale.quantile(topics, col("new_messages"), 0.75).as("q_new"),
      graft.functions.AtScale.quantile(topics, col("total_messages"), 0.75).as("q_total"))
    topics.crossJoin(broadcast(q))
      .filter(col("new_messages") > col("q_new") &&
        col("total_messages") > col("q_total") && col("active_groups") > 0)
      .select(col("cluster"), col("name"), col("partitions"),
        col("total_messages"), col("new_messages"), col("active_groups"))
  }

  /** A5: cluster totals (processing/clusters.py:93-99). */
  def clusterTotals(wm: DataFrame, gd: DataFrame): DataFrame = {
    val wLatest = wm.filter(col("s") === NumScans)
    val t = wLatest.groupBy(col("cluster"))
      .agg(countDistinct(col("topic")).as("topics_count"),
        count(lit(1)).as("partitions_count"))
    val g = gd.filter(col("s") === NumScans).groupBy(col("cluster"))
      .agg(countDistinct(col("grp")).as("consumer_groups_count"))
    t.join(g, Seq("cluster"))
  }

  /** A10: pandas describe()-style summary over topics_df numeric columns,
    * written as explicit expressions so the oracle can reproduce the exact
    * arithmetic (std from exact integer sums; sample stddev). Reference
    * prints topics_df.describe() each scan (processing/clusters.py:108-109). */
  def describeStats(topics: DataFrame): DataFrame =
    describeStatsWith(topics, (c, q) =>
      graft.functions.AtScale.quantile(topics, col(c), q))

  /** The 100 TB form of describeStats with an explicit accuracy:
    * single-pass `percentile_approx` (bounded-error KLL-style sketch,
    * mergeable across partitions — no global sort) in place of exact
    * `percentile` (which must hold each group's values). Same schema.
    * The oracle-checked exact form stays the correctness witness;
    * describeStats itself switches here under the AtScale session conf. */
  def describeStatsApprox(topics: DataFrame, accuracy: Int = 10000): DataFrame =
    describeStatsWith(topics, (c, q) =>
      percentile_approx(col(c), lit(q), lit(accuracy)).cast("double"))

  /** One shared stats shape — the quantile builder is the ONLY thing the
    * exact and approx forms differ in (they were near-identical copies
    * before, a review finding: a change to the stats columns had to land
    * twice or the two forms silently diverged). */
  private def describeStatsWith(topics: DataFrame,
      quantile: (String, Double) => Column): DataFrame = {
    // Both columns' statistics in ONE aggregation pass (the previous
    // per-column agg + union planned two scans of `topics`); the two
    // output rows come from exploding a 2-struct array over the single
    // 1-row aggregate. Identical arithmetic on identical inputs — the
    // per-column expressions are unchanged, only named apart.
    val statCols = Seq("total_messages", "new_messages")
    val aggs = statCols.flatMap { c =>
      Seq(count(lit(1)).as(s"cnt_$c"),
        sum(col(c)).as(s"sx_$c"),
        sum(col(c) * col(c)).as(s"sxx_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        quantile(c, 0.25).as(s"q25_$c"),
        quantile(c, 0.5).as(s"q50_$c"),
        quantile(c, 0.75).as(s"q75_$c"),
        max(col(c)).cast("double").as(s"max_$c"))
    }
    val rows = statCols.map { c =>
      struct(lit(c).as("column"), col(s"cnt_$c").as("cnt"),
        (col(s"sx_$c").cast("double") / col(s"cnt_$c")).as("mean"),
        sqrt((col(s"sxx_$c").cast("double")
            - col(s"sx_$c").cast("double") * col(s"sx_$c") / col(s"cnt_$c"))
          / (col(s"cnt_$c") - 1)).as("std"),
        col(s"min_$c").as("min_v"), col(s"q25_$c").as("q25"),
        col(s"q50_$c").as("q50"), col(s"q75_$c").as("q75"),
        col(s"max_$c").as("max_v"))
    }
    topics.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("st"))
      .select(col("st.*"))
  }
}
