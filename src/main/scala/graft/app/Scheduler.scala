package graft.app

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scan/report cadence (W4/W5) — the reference's per-cluster loop
  * (kafka_overwatch/processing/clusters.py:80-122): scan every interval,
  * emit a report when the evaluation period has elapsed, sleep
  * interval - elapsed, warn on overrun.
  *
  * Clock and sleep are injected so the loop is unit-testable and the
  * engine never reads wall-clock inside query logic (SURVEY §7.4).
  */
object Scheduler {

  /** Q7 (documented extension): the reference declares
    * topic_include/exclude_regexes but never applies them; here they
    * filter the snapshot at ingest. Include list empty = include all;
    * exclude wins over include (both lists use re.match anchoring — the
    * caller provides '^'-anchored patterns). */
  def applyTopicFilters(wm: DataFrame, include: Seq[String],
                        exclude: Seq[String]): DataFrame = {
    val included =
      if (include.isEmpty) wm
      else wm.filter(include.map(r => col("topic").rlike(r)).reduce(_ || _))
    if (exclude.isEmpty) included
    else included.filter(!exclude.map(r => col("topic").rlike(r)).reduce(_ || _))
  }

  final case class TickResult(scanRan: Boolean, reportRan: Boolean,
                              sleptMillis: Long, overrunMillis: Long)

  /** One scheduler driving one cluster: call `loop` with the scan and
    * report actions; it runs `ticks` iterations (None = forever). */
  final class ClusterLoop(
      cluster: ClusterConfig,
      clock: () => Long = () => System.currentTimeMillis(),
      sleeper: Long => Unit = Thread.sleep,
      onOverrun: Long => Unit = _ => ()) {

    private var nextReportAt = Long.MinValue

    def tick(scan: () => Unit, report: () => Unit): TickResult = {
      val start = clock()
      scan()
      val reportRan = if (start >= nextReportAt) {
        report()
        nextReportAt = start + cluster.reporting.evaluationPeriodSeconds * 1000
        true
      } else false
      val elapsed = clock() - start
      val intervalMs = cluster.scanIntervalSeconds * 1000
      if (elapsed > intervalMs) {
        onOverrun(elapsed - intervalMs)
        TickResult(scanRan = true, reportRan, 0L, elapsed - intervalMs)
      } else {
        sleeper(intervalMs - elapsed)
        TickResult(scanRan = true, reportRan, intervalMs - elapsed, 0L)
      }
    }

    def loop(scan: () => Unit, report: () => Unit, ticks: Option[Int]): Unit = {
      var i = 0
      while (ticks.forall(i < _)) { tick(scan, report); i += 1 }
    }
  }
}
