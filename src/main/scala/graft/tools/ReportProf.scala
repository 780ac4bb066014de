package graft.tools

import org.apache.spark.sql.SparkSession

object ReportProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    import graft.sources.Snapshots
    time("warmup_events_read")(Snapshots.eventsRaw(spark, dir).count())
    time("watermarks")(Snapshots.watermarks(spark, dir).count())
    time("groupOffsets")(Snapshots.groupOffsets(spark, dir).count())
    time("topicsDf")(graft.operators.TopicAnalytics.topicsDf(
      Snapshots.watermarks(spark, dir), Snapshots.groupOffsets(spark, dir),
      Snapshots.groupsDim(spark, dir)).count())
    time("groupsDf")(graft.operators.GroupAnalytics.groupsDf(
      Snapshots.watermarks(spark, dir), Snapshots.groupOffsets(spark, dir),
      Snapshots.groupsDim(spark, dir)).count())
    time("report_query")(graft.SparkEntry.queries("q_cluster_report")(spark, dir).collect())
    time("report_query_again")(graft.SparkEntry.queries("q_cluster_report")(spark, dir).collect())
    spark.stop()
  }
}
