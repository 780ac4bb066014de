package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Snapshots.NumScans

/** Topic-config analytics + DR script generation (K6/F7).
  *
  * Reference: per-topic `kafka-topics.sh --create` command build at
  * kafka_overwatch/overwatch_resources/topics.py:174-191, driven from
  * overwatch_resources/clusters.py:253-278; only non-default config entries
  * are emitted.
  */
object ConfigOps {

  /** Non-default config entries per topic (the `is_default` filter the
    * reference applies per ConfigEntry). */
  def nonDefaultConfigs(tc: DataFrame): DataFrame =
    tc.filter(!col("is_default"))
      .select(col("cluster"), col("topic"), col("key"), col("value"))

  /** K6: one re-create command per topic. Config flags are ordered by key
    * for determinism; partition counts come from the latest watermark scan. */
  def drCommands(wm: DataFrame, tc: DataFrame): DataFrame = {
    val parts = wm.filter(col("s") === NumScans)
      .groupBy(col("cluster"), col("topic"))
      .agg(count(lit(1)).as("partitions"))
    val flags = nonDefaultConfigs(tc)
      .withColumn("flag", concat(lit(" --config "), col("key"), lit("="), col("value")))
      .groupBy(col("cluster"), col("topic"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("key"), col("flag")))),
          x => x.getField("flag")), "").as("config_flags"))
    parts.join(flags, Seq("cluster", "topic"), "left")
      .select(col("cluster"), col("topic"),
        concat(lit("kafka-topics.sh --create --topic "), col("topic"),
          lit(" --partitions "), col("partitions"),
          coalesce(col("config_flags"), lit(""))).as("command"))
  }
}
