package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.streaming.TransitionStream
import graft.streaming.TransitionStream.Ev

/** Streaming transitions == batch transitions when the full fixture
  * flows through in per-key event-time order, and state TTL breaks
  * chains across the horizon instead of bridging them. */
class TransitionStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed transition counts == batch matrix over the fixture") {
    implicit val sq = spark.sqlContext
    val rows = Relational.eventsWithEpoch(spark, TestSpark.Sf0001)
      .select($"user_id", $"epoch_s", $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
      .map(t => Ev(t._1, t._2, t._3, t._4))
      .sortBy(e => (e.epoch_s, e.event_id)) // log order: per-key in-order
    val input = MemoryStream[Ev]
    val q = TransitionStream.transitions(input.toDS(), ttlSeconds = 1L << 40)
      .writeStream.format("memory").queryName("trans_stream")
      .outputMode("append").start()
    try {
      val (b1, rest) = rows.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("trans_stream")
        .groupBy($"prev_type", $"event_type").count()
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = Relational.eventTransitions(
          Relational.eventsWithEpoch(spark, TestSpark.Sf0001))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("transitions"))
        .toMap
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("cross-key event-time skew within the watermark delay is not dropped") {
    // user 2's newer event lands in batch 1; user 1's older-but-per-key-
    // in-order event lands in batch 2. With the old hardcoded 0-second
    // watermark that event was silently dropped (watermark had already
    // advanced past it) and the streamed matrix diverged from batch;
    // with a delay covering the skew it must be counted.
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = TransitionStream.transitions(input.toDS(), ttlSeconds = 1L << 40,
        watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("trans_skew")
      .outputMode("append").start()
    try {
      input.addData(Seq(Ev(1L, 100L, 1L, "click"), Ev(2L, 900L, 2L, "click")))
      q.processAllAvailable()
      // 200 < max-event-time 900, but within the 1 h delay: must survive
      input.addData(Seq(Ev(1L, 200L, 3L, "view")))
      q.processAllAvailable()
      val out = spark.table("trans_skew")
        .select($"user_id", $"prev_type", $"event_type")
        .as[(Long, String, String)].collect().toSet
      assert(out.contains((1L, "click", "view")),
        "in-order event dropped by cross-key watermark advance")
    } finally q.stop()
  }

  test("event-time TTL evicts idle users: no transition bridges the horizon") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = TransitionStream.transitions(input.toDS(), ttlSeconds = 60L)
      .writeStream.format("memory").queryName("trans_ttl")
      .outputMode("append").start()
    try {
      input.addData(Seq(Ev(1L, 100L, 1L, "click"), Ev(1L, 110L, 2L, "view")))
      q.processAllAvailable()
      // another user far in the future advances the watermark past the TTL
      input.addData(Seq(Ev(2L, 10000L, 3L, "click")))
      q.processAllAvailable()
      input.addData(Seq(Ev(2L, 20000L, 4L, "view")))
      q.processAllAvailable()
      // user 1 returns long after eviction: fresh chain, no bridge pair
      input.addData(Seq(Ev(1L, 30000L, 5L, "purchase")))
      q.processAllAvailable()
      input.addData(Seq(Ev(1L, 30010L, 6L, "refund")))
      q.processAllAvailable()
      val out = spark.table("trans_ttl")
        .select($"user_id", $"prev_type", $"event_type")
        .as[(Long, String, String)].collect().toSet
      assert(out.contains((1L, "click", "view")))
      assert(out.contains((2L, "click", "view")))
      assert(!out.contains((1L, "view", "purchase")), "bridged an evicted gap")
      assert(out.contains((1L, "purchase", "refund")))
    } finally q.stop()
  }
}
