package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._

class TypedViewsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("typed views decode every snapshot and analytic table") {
    val dir = TestSpark.Sf0001
    val wm: Seq[PartitionWatermark] = TypedViews.watermarks(spark, dir).collect().toSeq
    assert(wm.nonEmpty && wm.forall(w => w.high >= w.low && w.s >= 1))
    val ts: Seq[TopicStats] = TypedViews.topicStats(spark, dir).collect().toSeq
    assert(ts.map(_.name).toSet.contains("t_stale"))
    assert(ts.forall(t => t.active_groups <= t.consumer_groups))
    val gs: Seq[GroupStats] = TypedViews.groupStats(spark, dir).collect().toSeq
    assert(gs.map(_.name).toSet === Set("g_active", "g_empty", "g_dead", "g_mixed"))
    assert(TypedViews.srSubjects(spark, dir).collect().forall(_.version >= 1))
    assert(TypedViews.groupOffsets(spark, dir).count() > 0)
    assert(TypedViews.groups(spark, dir).count() === 24) // 4 groups x 3 scans x 2 clusters
  }

  test("typed pipeline: compile-checked field access composes with groupByKey") {
    import spark.implicits._
    val byState = TypedViews.groupStats(spark, TestSpark.Sf0001)
      .groupByKey(_.state)
      .mapGroups((state, gs) => (state, gs.map(_.overall_lag).sum))
      .collect().toMap
    assert(byState.keySet === Set("STABLE", "EMPTY", "DEAD"))
    assert(byState("STABLE") > 0)
  }
}
