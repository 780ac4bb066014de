package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Snapshots

/** The kafka-metadata DataSourceV2: same rows as the fixture derivation,
  * filter pushdown prunes input partitions, column pruning reaches the
  * reader. */
class DataSourceV2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def src = spark.read.format("kafka-metadata")
    .option("dir", TestSpark.Sf0001).load()

  test("source rows equal the snapshot derivation") {
    import spark.implicits._
    val viaSource = src.as[(String, String, Long, Long, Long, Long, Long)]
      .collect().toSet
    val direct = Snapshots.watermarks(spark, TestSpark.Sf0001)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(viaSource === direct)
    assert(viaSource.nonEmpty)
  }

  test("topic equality filter is pushed into partition planning") {
    import spark.implicits._
    val filtered = src.filter($"topic" === "t_stale")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters") || plan.contains("kafka_metadata"),
      s"unexpected plan: $plan")
    // partition pruning: the scan's RDD has exactly 1 partition for 1 topic
    assert(filtered.rdd.getNumPartitions === 1)
    assert(filtered.count() === Snapshots.NumScans)
  }

  test("group_offsets table equals the snapshot derivation, pruned per topic") {
    import spark.implicits._
    val src = spark.read.format("kafka-metadata")
      .option("dir", TestSpark.Sf0001).option("table", "group_offsets").load()
    val viaSource = src.as[(String, String, String, Long, Long, Long, Long)]
      .collect().toSet
    val direct = Snapshots.groupOffsets(spark, TestSpark.Sf0001)
      .as[(String, String, String, Long, Long, Long, Long)].collect().toSet
    assert(viaSource === direct && viaSource.nonEmpty)
    // topic pushdown prunes to one input partition
    assert(src.filter($"topic" === "t_nop0").rdd.getNumPartitions === 1)
  }

  test("groups table equals the snapshot dimension, one partition per group") {
    import spark.implicits._
    val src = spark.read.format("kafka-metadata")
      .option("dir", TestSpark.Sf0001).option("table", "groups").load()
    val viaSource = src.as[(String, String, String, Long, Long, Long)]
      .collect().toSet
    val direct = Snapshots.groupsDim(spark, TestSpark.Sf0001)
      .as[(String, String, String, Long, Long, Long)].collect().toSet
    assert(viaSource === direct && viaSource.nonEmpty)
    assert(src.filter($"grp" === "g_active").rdd.getNumPartitions === 1)
  }

  test("unsupported filters still evaluate correctly post-scan") {
    import spark.implicits._
    val n = src.filter($"high" > 0 && $"s" === 3L).count()
    val expect = Snapshots.watermarks(spark, TestSpark.Sf0001)
      .filter($"high" > 0 && $"s" === 3L).count()
    assert(n === expect)
  }

  test("micro-batch stream delivers the full history scan-by-scan into the stateful pipeline") {
    import spark.implicits._
    val stream = spark.readStream.format("kafka-metadata")
      .option("dir", TestSpark.Sf0001).load()
      .select("cluster", "topic", "partition_id", "low", "high", "scan_ts")
      .as[graft.streaming.OffsetStream.WatermarkScan]
    val q = graft.streaming.OffsetStream.deltas(stream)
      .writeStream.format("memory").queryName("dsv2_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT cluster, topic, partition_id, scan_ts, delta FROM dsv2_stream_out")
        .as[(String, String, Long, Long, Long)].collect().toSet
      val batch = graft.operators.Deltas
        .partitionDeltas(Snapshots.watermarks(spark, TestSpark.Sf0001))
        .as[(String, String, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
      // one micro-batch per scan: the query saw NumScans batches
      assert(q.recentProgress.count(_.numInputRows > 0) === Snapshots.NumScans)
    } finally q.stop()
  }

  test("micro-batch stream restart from checkpoint emits no duplicates") {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-stream-out").toString
    def run(): Unit = {
      val q = spark.readStream.format("kafka-metadata")
        .option("dir", TestSpark.Sf0001).load()
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // consumes all three scans
    val afterFirst = spark.read.parquet(out).count()
    run() // restart from checkpoint: offset deserialized, nothing new
    val afterSecond = spark.read.parquet(out).count()
    assert(afterFirst === Snapshots.watermarks(spark, TestSpark.Sf0001).count())
    assert(afterSecond === afterFirst, "restart must not re-emit consumed scans")
  }

  test("column pruning reaches the reader") {
    import spark.implicits._
    val two = src.select($"topic", $"high")
    assert(two.schema.fieldNames.toSeq === Seq("topic", "high"))
    assert(two.count() === Snapshots.watermarks(spark, TestSpark.Sf0001).count())
  }
}
