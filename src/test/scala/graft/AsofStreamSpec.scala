package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.AsofStream
import graft.streaming.AsofStream.AsofEvent
import graft.operators.Relational

/** Batch == stream equivalence for the as-of enrichment: the stateful
  * streaming form fed event-time-ordered micro-batches must produce
  * exactly the batch AsofJoin result on the same events. */
class AsofStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming as-of enrichment equals the batch as-of join") {
    implicit val sq = spark.sqlContext
    val ev = Relational.eventsWithEpoch(spark, TestSpark.Sf0001)
      .withColumn("tus", expr("(ts - pmod(ts, 1000)) div 1000"))
    val asofEvents = ev
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", $"tus",
        when($"event_type" === "click", 0).otherwise(1).as("tag"),
        $"event_id".as("id"), $"value")
      .as[AsofEvent]
      .collect()
      .sortBy(e => (e.tus, e.tag, e.id))

    val input = MemoryStream[AsofEvent]
    val q = AsofStream.enrich(input.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // three event-time-ordered micro-batches (the ordering contract)
      asofEvents.grouped(math.max(1, asofEvents.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("asof_out")
    val batch = Relational.purchaseClickAsof(
      Relational.eventsWithEpoch(spark, TestSpark.Sf0001))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("state expires ttlSeconds of event time after its reference") {
    implicit val sq = spark.sqlContext
    val us = 1000000L
    val input = MemoryStream[AsofEvent]
    val q = AsofStream.enrich(input.toDS(), ttlSeconds = 60L)
      .writeStream.format("memory").queryName("asof_ttl")
      .outputMode("append").start()
    try {
      input.addData(Seq(AsofEvent(1L, 100L * us, 0, 10L, 5.0)))
      q.processAllAvailable()
      // another key's event advances the watermark past 100s + 60s TTL
      input.addData(Seq(AsofEvent(2L, 500L * us, 0, 20L, 1.0)))
      q.processAllAvailable()
      // user 1's click state has expired: the purchase attributes to nothing
      input.addData(Seq(AsofEvent(1L, 600L * us, 1, 30L, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("asof_ttl").collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 30L && rows.head.isNullAt(3))
  }

  test("horizon is exact even when state outlives it by a micro-batch") {
    // regression (ADVICE r3): the TTL was enforced only by the
    // watermark-driven state timeout, so a subject arriving > ttl after
    // the reference in the VERY NEXT micro-batch (watermark not yet past
    // ref + ttl) still attributed to the stale reference. The enrichment
    // match must re-check the gap itself.
    implicit val sq = spark.sqlContext
    val us = 1000000L
    val input = MemoryStream[AsofEvent]
    val q = AsofStream.enrich(input.toDS(), ttlSeconds = 60L)
      .writeStream.format("memory").queryName("asof_horizon")
      .outputMode("append").start()
    try {
      input.addData(Seq(AsofEvent(1L, 100L * us, 0, 10L, 5.0)))
      q.processAllAvailable()
      // inside the horizon (gap 50s <= 60s): matches, state alive
      input.addData(Seq(AsofEvent(1L, 150L * us, 1, 29L, 0.0)))
      q.processAllAvailable()
      // watermark is at 150s — before 100s + 60s... barely, but the state
      // row survives until the watermark PASSES it; the purchase at 400s
      // is 300s past the click and must STILL attribute to nothing even
      // though the state row may not have timed out yet.
      input.addData(Seq(AsofEvent(1L, 400L * us, 1, 30L, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("asof_horizon").orderBy($"purchase_id").collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(0) === 29L && rows(0).getLong(3) === 10L)
    assert(rows(0).getLong(5) === 50L)
    assert(rows(1).getLong(0) === 30L && rows(1).isNullAt(3),
      s"stale reference leaked past the horizon: ${rows(1)}")
  }

  test("same-timestamp reference ties resolve to max id, inclusively") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[AsofEvent]
    val q = AsofStream.enrich(input.toDS())
      .writeStream.format("memory").queryName("asof_ties")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        AsofEvent(7L, 100L, 0, 11L, 1.0),
        AsofEvent(7L, 100L, 0, 12L, 2.0), // same ts, higher id wins
        AsofEvent(7L, 100L, 1, 90L, 0.0), // equal ts -> click visible
        AsofEvent(7L, 99L, 1, 89L, 0.0))) // before click -> null
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("asof_ties").orderBy($"purchase_id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(89L, 90L))
    assert(rows(0).isNullAt(3))
    assert(rows(1).getLong(3) === 12L && rows(1).getDouble(4) === 2.0)
    assert(rows(1).getLong(5) === 0L)
  }
}
