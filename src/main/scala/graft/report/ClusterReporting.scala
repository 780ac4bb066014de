package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Governance, SchemaRegistryOps, TopicAnalytics}

/** Cluster usage report assembly — the reference's main output document
  * (K1), mirroring its JSON contract (reference:
  * kafka_overwatch/specs/report.py:10-143 / specs/report.json, assembled
  * at reporting/__init__.py:104-130).
  *
  * The whole report is ONE Spark job: every fragment is a 1-row DataFrame
  * and the final document is a single nested struct row serialized with
  * to_json. Deviations from the reference, per SURVEY §2.10:
  *  - Statistics.consumer_groups is populated (Q4 — reference declares but
  *    never fills it),
  *  - EstimatedWaste.topics/partitions carry real sums (Q5 — reference
  *    hardcodes 0),
  *  - governance division-by-zero guarded (Q6).
  */
object ClusterReporting {

  /** Waste-category keys + descriptions exactly as the reference emits
    * them (reporting/topics.py:29-41,43-81,83-111). */
  val CategoryMeta: Seq[(String, org.apache.spark.sql.Column, String)] = Seq(
    ("no_messages", TopicAnalytics.emptyPred,
      "All the topics with no messages."),
    ("no_active_cg_no_messages_topics_with_multiple_partitions",
      TopicAnalytics.deadWeightPred,
      "Topics with no messages, no active consumer group, and more than one partition"),
    ("no_cgs_and_no_new_messages", TopicAnalytics.stalePred,
      "Topics with messages, but no active consumer group and no messages produced during the evaluation period"))

  /** One waste-category struct: topics map(name->partitions), counts,
    * description, cluster percentage. */
  private def categoryStruct(topics: DataFrame, pred: org.apache.spark.sql.Column,
                             description: String): DataFrame = {
    val total = topics.agg(count(lit(1)).as("total"))
    topics.filter(pred)
      .agg(
        coalesce(map_from_entries(collect_list(struct(col("name"), col("partitions")))),
          map(). cast("map<string,bigint>")).as("topics"),
        coalesce(sum(col("partitions")), lit(0L)).as("topic_partitions_sum"),
        count(lit(1)).as("topics_count"))
      .crossJoin(total)
      .select(struct(
        col("topics"),
        col("topic_partitions_sum"),
        lit(description).as("description"),
        col("topics_count"),
        when(col("total") === 0, lit(null))
          .otherwise(expr("topics_count * 100 div total")).cast("double")
          .as("cluster_percentage")).as("category"),
        col("topics_count"), col("topic_partitions_sum"))
  }

  /** estimated_waste struct (EstimatedWaste, specs/report.py:105-111). */
  def estimatedWaste(topics: DataFrame): DataFrame = {
    val cats = CategoryMeta.map { case (key, pred, desc) =>
      categoryStruct(topics, pred, desc)
        .select(struct(lit(key).as("key"), col("category").as("value")).as("entry"),
          col("topics_count"), col("topic_partitions_sum"))
    }
    cats.reduce(_ unionByName _)
      .agg(
        sum(col("topics_count")).as("topics"),
        sum(col("topic_partitions_sum")).as("partitions"),
        map_from_entries(collect_list(col("entry"))).as("topic_categories"))
      .select(struct(col("topics"), col("partitions"), col("topic_categories"))
        .as("estimated_waste"))
  }

  /** statistics struct incl. the Q4 extension (active = zero-lag groups
    * with members, per the spec's field description). */
  def statistics(topics: DataFrame, groups: DataFrame): DataFrame = {
    val t = topics.agg(count(lit(1)).as("topics"),
      sum(col("partitions")).as("partitions"))
    val most = TopicAnalytics.mostActive(topics)
      .agg(coalesce(map_from_entries(collect_list(struct(col("name"),
        struct(col("partitions"), col("total_messages"), col("new_messages"),
          col("active_groups"))))),
        map().cast("map<string,struct<partitions:bigint,total_messages:bigint,new_messages:bigint,active_groups:bigint>>"))
        .as("most_active_topics"))
    val cg = groups.agg(
      count(lit(1)).as("total"),
      sum(when(col("overall_lag") === 0 && col("members") > 0, 1L).otherwise(0L))
        .as("active"),
      sum(when(col("overall_lag") > 0 || col("members") === 0, 1L).otherwise(0L))
        .as("inactive"))
      .select(struct(col("total"), col("active"), col("inactive")).as("consumer_groups"))
    t.crossJoin(most).crossJoin(cg)
      .select(struct(col("topics"), col("partitions"), col("most_active_topics"),
        col("consumer_groups")).as("statistics"))
  }

  /** governance struct: one naming-convention report per resource kind
    * (Q1 fixed: separate regex sets). */
  def governance(topics: DataFrame, groups: DataFrame,
                 topicCompliant: Seq[String] = Governance.DefaultCompliant,
                 topicExcluded: Seq[String] = Governance.DefaultExcluded,
                 groupCompliant: Seq[String] = Seq("^[a-z]+$"),
                 groupExcluded: Seq[String] = Seq("^g_dead")): DataFrame = {
    def conv(named: DataFrame, compliant: Seq[String], excluded: Seq[String]) =
      Governance.governed(named, compliant, excluded).agg(
        count(lit(1)).cast("double").as("total"),
        sum(when(col("excluded_name"), 1L).otherwise(0L)).cast("double")
          .as("total_ignored"),
        (count(lit(1)) - sum(when(col("excluded_name"), 1L).otherwise(0L)))
          .cast("double").as("total_measured"),
        (lit(100.0) - sum(when(!col("compliant_name") && !col("excluded_name"), 1L)
          .otherwise(0L)) * lit(100.0) /
          nullif(count(lit(1)) - sum(when(col("excluded_name"), 1L).otherwise(0L)),
            lit(0L))).as("compliant_percentage"),
        coalesce(sort_array(collect_list(
          when(!col("compliant_name") && !col("excluded_name"), col("name")))),
          array().cast("array<string>")).as("non_compliant_resources"))
    val t = conv(topics, topicCompliant, topicExcluded)
      .select(struct(col("*")).as("topic_naming_convention"))
    val g = conv(groups.select(col("name")), groupCompliant, groupExcluded)
      .select(struct(col("*")).as("consumer_group_naming_convention"))
    t.crossJoin(g)
      .select(struct(col("topic_naming_convention"),
        col("consumer_group_naming_convention")).as("governance"))
  }

  /** schema_registry struct (SchemaRegistryReport + SchemasWasteEstimates). */
  def schemaRegistry(sr: DataFrame, topics: DataFrame): DataFrame = {
    val counts = sr.agg(countDistinct(col("subject")).as("subjects_count"),
      countDistinct(col("schema_id")).as("schemas_count"))
    val unused = SchemaRegistryOps.unusedSubjects(sr, topics)
      .agg(coalesce(sort_array(collect_list(col("subject"))), array().cast("array<string>"))
        .as("detected_unused"),
        countDistinct(col("subject")).as("detected_unused_count"))
      .select(struct(col("detected_unused"), col("detected_unused_count"))
        .as("schemas_estimates"))
    counts.crossJoin(unused)
      .select(struct(col("subjects_count"), col("schemas_count"),
        col("schemas_estimates")).as("schema_registry"))
  }

  /** The full ClusterReport as a single nested row. `now` is injected so
    * report generation is reproducible (the reference scatters utcnow()
    * across call sites — SURVEY §7.4). */
  def clusterReport(clusterName: String, topics: DataFrame, groups: DataFrame,
                    sr: DataFrame, wmTopics: DataFrame, now: java.time.Instant,
                    topicCompliant: Seq[String] = Governance.DefaultCompliant,
                    topicExcluded: Seq[String] = Governance.DefaultExcluded,
                    groupCompliant: Seq[String] = Seq("^[a-z]+$"),
                    groupExcluded: Seq[String] = Seq("^g_dead")): DataFrame = {
    val ts = java.time.LocalDateTime.ofInstant(now, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    statistics(topics, groups)
      .crossJoin(estimatedWaste(topics))
      .crossJoin(governance(topics, groups, topicCompliant, topicExcluded,
        groupCompliant, groupExcluded))
      .crossJoin(schemaRegistry(sr, wmTopics))
      .select(struct(
        lit(clusterName).as("cluster_name"),
        struct(lit(ts).as("timestamp")).as("metadata"),
        col("governance"),
        col("statistics"),
        col("estimated_waste"),
        col("schema_registry")).as("cluster"))
  }

  /** K1: the report as a JSON document string (driver writes it to its
    * destination; on a cluster this single row costs nothing to collect). */
  def reportJson(report: DataFrame): String =
    report.select(to_json(struct(col("cluster")))).collect()(0).getString(0)

  /** K2: DataFrame export — csv/json to a directory, formats per config
    * (reference reporting/tools.py:38-61). */
  def exportDf(df: DataFrame, outDir: String, name: String,
               formats: Seq[String] = Seq("csv", "json")): Unit =
    formats.foreach {
      case "csv" =>
        df.coalesce(1).write.mode("overwrite").option("header", "true")
          .csv(s"$outDir/$name.csv")
      case "json" =>
        df.coalesce(1).write.mode("overwrite").json(s"$outDir/$name.json")
      case other => throw new IllegalArgumentException(s"unsupported format $other")
    }
}
