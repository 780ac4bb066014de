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

  def readWatermarks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Latest-scan view — prunes to the single newest partition directory. */
  def latest(spark: SparkSession, path: String): DataFrame = {
    val df = readWatermarks(spark, path)
    df.filter(col("s") === Snapshots.NumScans)
  }
}
