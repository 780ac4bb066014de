package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{GroupAnalytics, TopicAnalytics}
import graft.sources.Snapshots

/** Multi-cluster correctness: one engine instance serves N clusters via
  * the cluster column (SURVEY §1.1) — analytics must neither mix clusters
  * nor depend on a single-cluster assumption. A synthetic second cluster
  * (same topics, halved offsets) is unioned in; every per-cluster result
  * must equal the cluster computed alone. */
class MultiClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def c2(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("cluster", lit("c2"))
      .withColumn("high", expr("high div 2"))
      .withColumn("low", expr("high div 8"))
  private def both = {
    val wm = Snapshots.watermarks(spark, TestSpark.Sf0001)
    wm.unionByName(c2(wm))
  }
  private def goBoth = {
    val go = Snapshots.groupOffsets(spark, TestSpark.Sf0001)
    go.unionByName(go.withColumn("cluster", lit("c2"))
      .withColumn("committed", expr("committed div 2")))
  }
  private def gdBoth = {
    val gd = Snapshots.groupsDim(spark, TestSpark.Sf0001)
    gd.unionByName(gd.withColumn("cluster", lit("c2")))
  }

  test("topics_df per cluster equals the cluster computed alone") {
    val combined = TopicAnalytics.topicsDf(both, goBoth, gdBoth)
    val aloneC1 = TopicAnalytics.topicsDf(
      Snapshots.watermarks(spark, TestSpark.Sf0001),
      Snapshots.groupOffsets(spark, TestSpark.Sf0001),
      Snapshots.groupsDim(spark, TestSpark.Sf0001))
    val fromCombined = combined.filter($"cluster" === "c1")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    val alone = aloneC1
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(fromCombined === alone)
    // and c2 differs (halved offsets) but has the same topics
    val c2rows = combined.filter($"cluster" === "c2")
    assert(c2rows.count() === aloneC1.count())
    // c2 t_stale: high = 100 div 2 = 50, low = 50 div 8 = 6 -> total 44
    assert(combined.filter($"cluster" === "c2" && $"name" === "t_stale")
      .select("total_messages").as[Long].collect()(0) === 44L)
  }

  test("group lag per cluster is independent") {
    val combined = GroupAnalytics.groupsDf(both, goBoth, gdBoth)
    assert(combined.select("cluster").distinct().count() === 2)
    val l1 = combined.filter($"cluster" === "c1" && $"name" === "g_active")
      .select("overall_lag").as[Long].collect()(0)
    val l2 = combined.filter($"cluster" === "c2" && $"name" === "g_active")
      .select("overall_lag").as[Long].collect()(0)
    assert(l1 > 0 && l2 > 0 && l1 != l2)
  }

  test("cluster totals count each cluster separately") {
    val t = TopicAnalytics.clusterTotals(both, gdBoth)
      .as[(String, Long, Long, Long)].collect().map(_._1).toSet
    assert(t === Set("c1", "c2"))
  }
}
