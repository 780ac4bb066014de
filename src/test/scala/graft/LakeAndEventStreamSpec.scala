package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.sources.{SnapshotLake, Snapshots}
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class LakeAndEventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partitioned lake round-trips and prunes partitions at the scan") {
    import spark.implicits._
    val wm = Snapshots.watermarks(spark, TestSpark.Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-lake").toString
    SnapshotLake.writeWatermarks(wm, dir)
    // round trip (column order differs: partition cols move last)
    val back = SnapshotLake.readWatermarks(spark, dir)
      .select("cluster", "topic", "partition_id", "low", "high", "scan_ts", "s")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    val orig = wm.select("cluster", "topic", "partition_id", "low", "high", "scan_ts", "s")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(back === orig)
    // pruning: the physical plan carries the partition filter
    val lat = SnapshotLake.latest(spark, dir)
    val plan = lat.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("s#"),
      s"no partition filter in: $plan")
    assert(lat.count() === wm.filter($"s" === Snapshots.NumScans).count())
  }

  test("bucketed snapshot tables join without a shuffle") {
    val wm = Snapshots.watermarks(spark, TestSpark.Sf0001)
      .select("topic", "partition_id", "high", "s")
    val go = Snapshots.groupOffsets(spark, TestSpark.Sf0001)
      .select("topic", "partition_id", "committed", "s")
    SnapshotLake.writeBucketed(wm, "wm_bucketed")
    SnapshotLake.writeBucketed(go, "go_bucketed")
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcKey)
    try {
      // force the shuffle-shaped strategy (at 100 TB neither side
      // broadcasts): co-located buckets must make it exchange-free
      spark.conf.set(bcKey, "-1")
      val joined = spark.table("go_bucketed")
        .join(spark.table("wm_bucketed"), Seq("topic", "partition_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set(bcKey, prev)
      spark.sql("DROP TABLE IF EXISTS wm_bucketed")
      spark.sql("DROP TABLE IF EXISTS go_bucketed")
    }
  }

  test("compaction preserves baseline-vs-latest analytics") {
    import spark.implicits._
    val dir = TestSpark.Sf0001
    val wm = Snapshots.watermarks(spark, dir)
    val compacted = SnapshotLake.compact(wm, keepFrom = Snapshots.NumScans)
    assert(compacted.count() < wm.count())
    val go = Snapshots.groupOffsets(spark, dir)
    val gd = Snapshots.groupsDim(spark, dir)
    def topicsOf(w: org.apache.spark.sql.DataFrame) =
      graft.operators.TopicAnalytics.topicsDf(w, go, gd)
        .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSet
    assert(topicsOf(compacted) === topicsOf(wm))
    def wasteOf(w: org.apache.spark.sql.DataFrame) =
      graft.operators.TopicAnalytics.wasteSummary(
        graft.operators.TopicAnalytics.topicsDf(w, go, gd))
        .as[(String, Long, Long, Long)].collect().toSet
    assert(wasteOf(compacted) === wasteOf(wm))
  }

  test("retention bounds the lake while W1-W3 stay invariant on the window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Deltas
    // grow the 3-scan fixture into an 8-scan history (the retention
    // scenario: a 60 s cadence accumulating scans)
    val base = Snapshots.watermarks(spark, TestSpark.Sf0001)
    val latest = base.filter($"s" === Snapshots.NumScans)
    val extra = (1 to 5).map { i =>
      latest
        .withColumn("s", lit(Snapshots.NumScans + i.toLong))
        .withColumn("high", $"high" + lit(7L * i))
        .withColumn("low", $"low" + lit(i.toLong))
        .withColumn("scan_ts",
          lit(Snapshots.Epoch0 + Snapshots.Step * (Snapshots.NumScans + i)))
    }.reduce(_ unionByName _)
    val maxS = Snapshots.NumScans + 5L
    val dir = java.nio.file.Files.createTempDirectory("graft-lake-ret")
      .toString + "/wm"
    SnapshotLake.writeWatermarks(base.unionByName(extra), dir)
    val before = SnapshotLake.readWatermarks(spark, dir).localCheckpoint()

    val keepLast = 3
    val keepFrom = maxS - keepLast + 1
    val tsFrom = Snapshots.Epoch0 + Snapshots.Step * keepFrom
    SnapshotLake.applyRetention(spark, dir, keepLast)
    val after = SnapshotLake.readWatermarks(spark, dir).localCheckpoint()

    // bounded: keepLast live scans + ONE baseline ordinal, rows AND dirs
    assert(after.select("s").distinct().count() === keepLast + 1L)
    val c1Dirs = new java.io.File(dir + "/cluster=c1").list()
      .count(_.startsWith("s="))
    assert(c1Dirs === keepLast + 1)
    assert(after.count() < before.count())

    def w3(df: org.apache.spark.sql.DataFrame) =
      Deltas.logStart(df).as[(String, String, Long, Long, Boolean)]
        .collect().toSet
    assert(w3(after) === w3(before))

    def w2(df: org.apache.spark.sql.DataFrame) =
      Deltas.baselineDeltas(df).filter($"scan_ts" >= tsFrom)
        .as[(String, String, Long, Long, Long)].collect().toSet
    assert(w2(after) === w2(before))

    // W1: deltas between retained consecutive scans are untouched...
    def w1(df: org.apache.spark.sql.DataFrame, from: Long) =
      Deltas.partitionDeltas(df).filter($"scan_ts" > from)
        .as[(String, String, Long, Long, Long)].collect().toSet
    assert(w1(after, tsFrom) === w1(before, tsFrom))
    // ...and the one synthetic baseline->oldest-retained delta is the
    // exact aggregated catch-up over the scans it replaced
    val catchUp = Deltas.partitionDeltas(after.filter($"topic" === "click"))
      .filter($"scan_ts" === tsFrom)
      .agg(sum($"delta")).as[Long].collect()(0)
    val replaced = Deltas.partitionDeltas(before.filter($"topic" === "click"))
      .filter($"scan_ts" <= tsFrom)
      .agg(sum($"delta")).as[Long].collect()(0)
    assert(catchUp === replaced)
  }

  test("retention recovers the crash window and tolerates an empty lake") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val wm = Snapshots.watermarks(spark, TestSpark.Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-lake-rec")
      .toString + "/wm"
    SnapshotLake.writeWatermarks(wm, dir)
    val want = SnapshotLake.readWatermarks(spark, dir)
      .select("cluster", "topic", "partition_id", "low", "high", "scan_ts", "s")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    // simulate the non-atomic window: lake moved aside, swap-in never ran
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".expired")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + ".retaining")) // stale stage
    SnapshotLake.recoverRetention(spark, dir)
    val got = SnapshotLake.readWatermarks(spark, dir)
      .select("cluster", "topic", "partition_id", "low", "high", "scan_ts", "s")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".retaining")))
    // applyRetention itself self-recovers and runs through
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".expired")))
    SnapshotLake.applyRetention(spark, dir, keepLast = 2)
    assert(SnapshotLake.readWatermarks(spark, dir).count() > 0)
    // empty lake: zero rows (but schema-ful files — a partitioned write
    // of zero rows leaves no footers at all) -> no-op, no NPE, untouched
    val emptyDir = java.nio.file.Files.createTempDirectory("graft-lake-empty")
      .toString + "/wm"
    wm.filter(lit(false)).write.mode("overwrite").parquet(emptyDir)
    SnapshotLake.applyRetention(spark, emptyDir, keepLast = 2)
    assert(SnapshotLake.readWatermarks(spark, emptyDir).count() === 0L)
  }

  test("streaming minute rollup with watermark equals the batch rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L
    val events = Seq(
      Event(1, base + 10, 1, "click", 1.5),
      Event(2, base + 20, 2, "click", 2.0),
      Event(3, base + 70, 1, "view", 3.25),
      Event(4, base + 80, 3, "click", 0.5),
      Event(5, base + 130, 2, "view", 1.0))
    val batch = EventStream.minuteRollup(spark.createDataset(events))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    val input = MemoryStream[Event]
    val q = EventStream.minuteRollup(input.toDS())
      .writeStream.format("memory").queryName("minute_out")
      .outputMode(OutputMode.Complete).start()
    try {
      // two micro-batches, second one partially late but within watermark
      input.addData(events.take(3)); q.processAllAvailable()
      input.addData(events.drop(3)); q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT minute_start, event_type, events, value_sum FROM minute_out")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(streamed === batch)
      assert(batch.size === 4) // (min0:click), (min1:view), (min1:click), (min2:view)
    } finally q.stop()
  }

  test("streaming session windows equal the batch session windows at flush") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L
    // user 1: two sessions (gap 40 min); user 2: one session spanning
    // both micro-batches (the merge-on-overlap case)
    val events = Seq(
      Event(1, base + 10, 1, "click", 1.0),
      Event(2, base + 600, 1, "view", 1.0),
      Event(3, base + 700, 2, "click", 1.0),
      Event(4, base + 1500, 2, "view", 1.0),   // extends user 2's session
      Event(5, base + 600 + 2400 + 10, 1, "click", 1.0)) // 40 min gap -> new session
    val batch = EventStream.sessionRollup(spark.createDataset(events))
      .as[(Long, Long, Long, Long)].collect().toSet

    val input = MemoryStream[Event]
    val q = EventStream.sessionRollup(input.toDS())
      .writeStream.format("memory").queryName("session_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(events.take(3)); q.processAllAvailable()
      input.addData(events.drop(3)); q.processAllAvailable()
      // append mode emits a session only once the watermark passes its
      // end: a far-future sentinel (user -1) advances the watermark
      input.addData(Seq(Event(99, base + 100000, -1L, "flush", 0.0)))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT user_id, s_start, s_end, events FROM session_out WHERE user_id >= 0")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(batch.size === 3) // 2 sessions for user 1, 1 for user 2
    } finally q.stop()
  }
}
