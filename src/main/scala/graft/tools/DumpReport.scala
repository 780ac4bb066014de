package graft.tools

import org.apache.spark.sql.SparkSession
import graft.report.ClusterReporting
import graft.sources.Snapshots
import graft.operators.{GroupAnalytics, TopicAnalytics}

/** Dev tool: print the cluster-report JSON for an sf dir with a fixed
  * injected timestamp, so refactors of the report assembly can be checked
  * for byte-identical output.
  * Usage: runMain graft.tools.DumpReport [sfDir]
  */
object DumpReport {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val wm = Snapshots.watermarks(spark, dir)
    val go = Snapshots.groupOffsets(spark, dir)
    val gd = Snapshots.groupsDim(spark, dir)
    val topics = TopicAnalytics.topicsDf(wm, go, gd)
    val groups = GroupAnalytics.groupsDf(wm, go, gd)
    val rpt = ClusterReporting.clusterReport("c1", topics, groups,
      Snapshots.srSubjects(spark, dir), wm,
      java.time.Instant.ofEpochSecond(1700000180L))
    println("REPORT_JSON\t" + ClusterReporting.reportJson(rpt))
    spark.stop()
  }
}
