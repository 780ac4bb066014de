package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.{AsofStream, DocStream}

/** State-size bounds under a CHURNING key population — the 100×-fleet
  * hazard (SURVEY §7.4, VERDICT r3 item 6): DocStream keys state by
  * content_hash and AsofStream by user_id, both unbounded domains, so
  * the event-time TTL must actually evict — state rows must plateau at
  * ~one live horizon's worth of keys while total distinct keys grow
  * without bound. A leak (state ~ all keys ever seen) fails immediately.
  *
  * (AnomalyStream is exempt by design: it consumes the per-minute
  * AGGREGATE stream keyed by event_type — a fixed catalog — with one
  * ring buffer per key; its scaladoc documents that chaining, and
  * AnomalyStreamSpec covers it.)
  *
  * Deployment note: these run on the default HDFS-backed in-memory
  * state store; at fleet scale configure RocksDB so state is bounded by
  * disk, not executor heap:
  *   spark.sql.streaming.stateStore.providerClass=
  *     org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
  *   spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true
  * The TTL semantics asserted here are provider-independent.
  */
class StreamingStateBoundSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Phases = 5
  private val KeysPerPhase = 100

  /** Max state rows observed per completed phase (from lastProgress). */
  private def stateRows(q: StreamingQuery): Long = {
    val p = q.lastProgress
    if (p == null || p.stateOperators.isEmpty) 0L
    else p.stateOperators.map(_.numRowsTotal).max
  }

  private def assertPlateau(perPhase: Seq[Long]): Unit = {
    val totalKeys = Phases.toLong * KeysPerPhase
    val peak = perPhase.max
    // one live horizon ~ KeysPerPhase keys; allow one extra phase of
    // not-yet-evicted keys (eviction lags one watermark update) + slack.
    assert(peak <= 3L * KeysPerPhase,
      s"state peaked at $peak rows for $totalKeys distinct keys — TTL is not evicting " +
        s"(per-phase: ${perPhase.mkString(", ")})")
    // and it must PLATEAU: the last phase may not sit above the second
    // phase by more than the slack a single horizon explains.
    assert(perPhase.last <= perPhase(1) + KeysPerPhase,
      s"state still growing at the end: ${perPhase.mkString(", ")}")
  }

  test("DocStream dedup state plateaus while distinct content hashes grow") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[DocStream.DocIngest]
    // ttl 60s, phases 300s apart: every phase's hashes are expired long
    // before the next phase's watermark
    val q = DocStream.curate(input.toDS(), minQuality = 0.0,
        watermarkDelay = "0 seconds", ttlSeconds = 60L)
      .writeStream.format("noop").outputMode("append").start()
    val observed = Seq.newBuilder[Long]
    try {
      for (p <- 0 until Phases) {
        val ts = new java.sql.Timestamp(p * 300L * 1000L)
        input.addData((0 until KeysPerPhase).map { i =>
          DocStream.DocIngest(p * 10000L + i,
            s"phase $p document $i with alpha beta gamma delta tokens",
            "en", "web", ts)
        })
        q.processAllAvailable()
        observed += stateRows(q)
      }
    } finally q.stop()
    assertPlateau(observed.result())
  }

  test("DocStream TTL semantics hold on the RocksDB state store") {
    // the deployment config from the scaladoc above, actually executed:
    // same churn, same plateau, on the provider a 100x fleet would run
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[DocStream.DocIngest]
      val q = DocStream.curate(input.toDS(), minQuality = 0.0,
          watermarkDelay = "0 seconds", ttlSeconds = 60L)
        .writeStream.format("noop").outputMode("append").start()
      val observed = Seq.newBuilder[Long]
      try {
        for (p <- 0 until Phases) {
          val ts = new java.sql.Timestamp(p * 300L * 1000L)
          input.addData((0 until KeysPerPhase).map { i =>
            DocStream.DocIngest(p * 10000L + i,
              s"phase $p rocks $i with alpha beta gamma delta tokens",
              "en", "web", ts)
          })
          q.processAllAvailable()
          observed += stateRows(q)
        }
        assert(q.lastProgress.stateOperators.exists(
          _.customMetrics.containsKey("rocksdbFilesCopied")),
          "query did not actually run on the RocksDB provider")
      } finally q.stop()
      assertPlateau(observed.result())
    } finally spark.conf.unset(key)
  }

  test("NearDupStream hamming-radius flavor holds ZERO state on RocksDB under churn") {
    // the near-dup match stream's bound is the strongest kind — stateless
    // by construction (stream-static equi-join) — but r4 only guarded its
    // growth in batch. Prove it under the deployment provider config with
    // a churning doc population: every micro-batch phase must report NO
    // stateful operator at all, while detections keep flowing.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val corpus = (0 until 50).map(i =>
        (i.toLong, s"corpus document $i alpha beta gamma delta epsilon"))
        .toDF("doc_id", "text")
      val index = graft.streaming.NearDupStream
        .simhashIndex(corpus, maxHamming = 4).localCheckpoint()
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.NearDupStream.simhashDetections(
          input.toDF().toDF("doc_id", "text"), index, maxHamming = 4)
        .writeStream.format("memory").queryName("neardup_state_bound")
        .outputMode("append").start()
      try {
        for (p <- 0 until Phases) {
          // each phase is a fresh population: near-dups of corpus docs
          // (detections flow) plus unrelated fillers (churn)
          input.addData((0 until KeysPerPhase).map { i =>
            if (i % 10 == 0)
              (1000000L + p * 10000L + i,
                s"corpus document ${i % 50} alpha beta gamma delta epsilon")
            else
              (1000000L + p * 10000L + i,
                s"phase $p filler $i zeta eta theta iota kappa lambda")
          })
          q.processAllAvailable()
          assert(q.lastProgress.stateOperators.isEmpty,
            s"phase $p grew a stateful operator in a stream-static join")
        }
        assert(spark.table("neardup_state_bound").count() > 0,
          "no detections flowed — the zero-state assertion is vacuous")
      } finally q.stop()
    } finally spark.conf.unset(key)
  }

  test("AsofStream reference state plateaus while distinct users grow") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val us = 1000000L
    val input = MemoryStream[AsofStream.AsofEvent]
    val q = AsofStream.enrich(input.toDS(), ttlSeconds = 60L)
      .writeStream.format("noop").outputMode("append").start()
    val observed = Seq.newBuilder[Long]
    try {
      for (p <- 0 until Phases) {
        val tus = p * 300L * us
        input.addData((0 until KeysPerPhase).map { i =>
          AsofStream.AsofEvent(p * 10000L + i, tus, 0, p * 100000L + i, 1.0)
        })
        q.processAllAvailable()
        observed += stateRows(q)
      }
    } finally q.stop()
    assertPlateau(observed.result())
  }

  test("TransitionStream LastSeen state plateaus while distinct users grow") {
    // one tiny row per LIVE user, TTL-evicted: a churning user population
    // must not accumulate state (each phase is a fresh user cohort whose
    // events sit one TTL horizon past the previous phase's)
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[graft.streaming.TransitionStream.Ev]
    // zero watermark delay: phases are only 300 s apart, and this input
    // is globally in-order so nothing can be late-dropped
    val q = graft.streaming.TransitionStream
      .transitions(input.toDS(), ttlSeconds = 60L, watermarkDelay = "0 seconds")
      .writeStream.format("noop").outputMode("append").start()
    val observed = Seq.newBuilder[Long]
    try {
      for (p <- 0 until Phases) {
        val base = p * 300L
        input.addData((0 until KeysPerPhase).map { i =>
          graft.streaming.TransitionStream.Ev(
            p * 10000L + i, base, p * 1000L + i, "click")
        })
        q.processAllAvailable()
        observed += stateRows(q)
      }
    } finally q.stop()
    assertPlateau(observed.result())
  }
}
