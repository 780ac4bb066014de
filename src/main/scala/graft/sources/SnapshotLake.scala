package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The snapshot lake: how the history tables persist at scale.
  *
  * Layout: parquet partitioned by (cluster, s). Every analytic in this
  * engine filters or groups on a prefix of that key — latest-scan queries
  * prune to one scan directory per cluster, baseline joins touch exactly
  * two, and full-history windows read one cluster's subtree. Partition
  * pruning happens at file listing, before any IO.
  *
  * (The `s` ordinal stands in for a date/hour partition in production;
  * compaction of old scans into baseline summaries bounds history growth
  * — SURVEY §7.4.)
  */
object SnapshotLake {

  def writeWatermarks(wm: DataFrame, path: String): Unit =
    wm.write.mode("overwrite")
      .partitionBy("cluster", "s")
      .parquet(path)

  /** Read back with the canonical column order and types: a partitioned
    * read appends the partition columns last and infers `s` as INT from
    * the directory names — restore the writer's schema so lake-backed
    * and derivation-backed DataFrames are interchangeable. */
  def readWatermarks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("cluster").cast("string"), col("topic"), col("partition_id"),
        col("low"), col("high"), col("scan_ts"), col("s").cast("long").as("s"))

  /** group_offsets in the same (cluster, s) layout. */
  def writeGroupOffsets(go: DataFrame, path: String): Unit =
    go.write.mode("overwrite")
      .partitionBy("cluster", "s")
      .parquet(path)

  def readGroupOffsets(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("cluster").cast("string"), col("grp"), col("topic"),
        col("partition_id"), col("committed"), col("scan_ts"),
        col("s").cast("long").as("s"))

  /** Latest-scan view — prunes to the single newest partition directory. */
  def latest(spark: SparkSession, path: String): DataFrame = {
    val df = readWatermarks(spark, path)
    df.filter(col("s") === Snapshots.NumScans)
  }

  /** Bucketed form of a snapshot table: hash-bucketed AND sorted by the
    * join key. Two tables bucketed the same way join with NO shuffle and
    * no sort — at 100 TB this is how the recurring lag join
    * (group_offsets x watermarks on (topic, partition_id)) runs as a
    * map-side zip of co-located buckets. Bucket count is the scale knob:
    * files per partition = buckets, each bucket pair joins in one task.
    * Requires saveAsTable (bucket metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int = 8,
                    keys: Seq[String] = Seq("topic", "partition_id")): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** History compaction (SURVEY §7.4): fold every scan older than
    * `keepFrom` into one synthetic baseline row per partition, carrying
    *  - the first observed high (the frozen init_end_offset baseline, W2),
    *  - the max low seen (the monotone log-start, W3),
    * tagged with the oldest scan's ordinal/timestamp. Recent scans stay
    * as-is. Baseline-vs-latest analytics (topics_df, waste, most-active)
    * are invariant under compaction — asserted in LakeAndEventStreamSpec —
    * while storage drops from O(scans) to O(keep window).
    */
  def compact(wm: DataFrame, keepFrom: Long): DataFrame = {
    val old = wm.filter(col("s") < keepFrom)
    val baseline = old.groupBy(col("cluster"), col("topic"), col("partition_id"))
      .agg(
        min_by(col("high"), col("s")).as("high"),
        max(col("low")).as("low"),
        min(col("scan_ts")).as("scan_ts"),
        min(col("s")).as("s"))
      .select(col("cluster"), col("topic"), col("partition_id"), col("low"),
        col("high"), col("scan_ts"), col("s"))
    baseline.unionByName(wm.filter(col("s") >= keepFrom))
  }
}
