package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.OffsetStream
import graft.streaming.OffsetStream.WatermarkScan
import graft.operators.Deltas
import graft.sources.Snapshots

/** Streaming/batch equivalence: feeding the watermark scans one
  * micro-batch per scan through the stateful stream must reproduce the
  * batch window-function deltas (W1). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stateful stream reproduces batch partition deltas across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wm = Snapshots.watermarks(spark, TestSpark.Sf0001)
    val byScan = (1 to Snapshots.NumScans).map { s =>
      wm.filter($"s" === s)
        .select("cluster", "topic", "partition_id", "low", "high", "scan_ts")
        .as[WatermarkScan].collect().toSeq
    }
    val input = MemoryStream[WatermarkScan]
    val q = OffsetStream.deltas(input.toDS())
      .writeStream.format("memory").queryName("deltas_out")
      .outputMode(OutputMode.Append).start()
    try {
      byScan.foreach { batch => input.addData(batch); q.processAllAvailable() }
      val streamed = spark.sql(
        "SELECT cluster, topic, partition_id, scan_ts, delta FROM deltas_out")
        .as[(String, String, Long, Long, Long)].collect().toSet
      val batch = Deltas.partitionDeltas(wm)
        .as[(String, String, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("state TTL evicts partitions unseen past the timeout (P9 as timeout)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WatermarkScan]
    val q = OffsetStream.deltasWithTtl(input.toDS(),
      watermarkDelay = "10 seconds", ttlSeconds = 60L)
      .writeStream.format("memory").queryName("ttl_out")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = 1700000000L
      // both topics seen at t0
      input.addData(Seq(WatermarkScan("c1", "keep", 0L, 0L, 10L, t0),
        WatermarkScan("c1", "gone", 0L, 0L, 10L, t0)))
      q.processAllAvailable()
      // 'keep' advances; 'gone' is silent while the watermark passes its TTL
      input.addData(Seq(WatermarkScan("c1", "keep", 0L, 0L, 20L, t0 + 300)))
      q.processAllAvailable()
      input.addData(Seq(WatermarkScan("c1", "keep", 0L, 0L, 30L, t0 + 600)))
      q.processAllAvailable()
      // 'gone' reappears: state was evicted, so this is a FRESH baseline
      // and emits no delta
      input.addData(Seq(WatermarkScan("c1", "gone", 0L, 0L, 50L, t0 + 610),
        WatermarkScan("c1", "keep", 0L, 0L, 40L, t0 + 610)))
      q.processAllAvailable()
      val byTopic = spark.sql("SELECT topic, count(*) FROM ttl_out GROUP BY 1")
        .as[(String, Long)].collect().toMap
      assert(byTopic("keep") === 3L)         // three deltas after baseline
      assert(!byTopic.contains("gone"))      // rebaselined, no delta emitted
    } finally q.stop()
  }

  test("app streaming mode runs the TTL pipeline with a real checkpoint and resumes") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-stream-app").toString
    // small TTL + zero delay so the fixture's t_gone (absent from scan 3)
    // is actually evicted inside the replay; the eviction-then-reappearance
    // state machine itself is covered by the MemoryStream TTL test above
    graft.app.GraftApp.runStreaming(spark, TestSpark.Sf0001, out,
      watermarkDelay = "0 seconds", ttlSeconds = 30L)
    val first = spark.read.parquet(s"$out/stream_deltas")
      .select("cluster", "topic", "partition_id", "scan_ts", "delta")
      .as[(String, String, Long, Long, Long)].collect().toSet
    val batch = Deltas.partitionDeltas(Snapshots.watermarks(spark, TestSpark.Sf0001))
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(first === batch)
    // restart with the same outDir: checkpoint resumes, no duplicates
    graft.app.GraftApp.runStreaming(spark, TestSpark.Sf0001, out,
      watermarkDelay = "0 seconds", ttlSeconds = 30L)
    val second = spark.read.parquet(s"$out/stream_deltas").count()
    assert(second === first.size.toLong, "restart must not re-emit rows")
  }

  test("stream state tracks the moving log-start offset (W3)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WatermarkScan]
    val q = OffsetStream.deltas(input.toDS())
      .writeStream.format("memory").queryName("logstart_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(WatermarkScan("c1", "t", 0L, 0L, 10L, 100L)))
      q.processAllAvailable()
      input.addData(Seq(WatermarkScan("c1", "t", 0L, 4L, 20L, 160L)))
      q.processAllAvailable()
      // retention never moves first_offset backwards
      input.addData(Seq(WatermarkScan("c1", "t", 0L, 2L, 30L, 220L)))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT scan_ts, delta, messages_since_start, first_offset FROM logstart_out ORDER BY scan_ts")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(rows === Seq((160L, 10L, 10L, 4L), (220L, 10L, 20L, 4L)))
    } finally q.stop()
  }
}
