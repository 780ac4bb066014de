package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.StreamBench

/** State-contract gate over the COMMITTED streaming benchmark artifact
  * (STREAM_BENCH.json, r10 verdict item 6): every twin's max observed
  * state-row count must sit inside its documented bound — zero for the
  * stateless serve paths and the admission gate, key-set-sized for the
  * fixed-topology/sketch twins, population- or TTL-window-bounded for
  * the keyed-state twins. Bounds are re-derived from the SAME constants
  * the harness feeds with (StreamBench.*), so a drive-parameter change
  * and its contract move together or this fails. */
class StreamBenchSpec extends AnyFunSuite {

  private val Twin =
    ("\"([a-z_]+)\":\\{\"events\":(\\d+),\"sec\":([0-9.]+)," +
      "\"rows_per_sec\":([0-9.]+),\"max_state_rows\":(\\d+)" +
      "(?:,\"note\":\"([^\"]*)\")?\\}").r

  private case class T(events: Long, sec: Double, maxState: Long,
                       note: Option[String])

  private lazy val artifact: Option[(Map[String, T], Int, Int, Int)] = {
    val f = new java.io.File("STREAM_BENCH.json")
    if (!f.exists()) None
    else {
      val src = scala.io.Source.fromFile(f)
      try {
        val body = src.mkString
        def intOf(k: String) =
          s""""$k":(\\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt)
        val twins = Twin.findAllMatchIn(body).map(m =>
          m.group(1) -> T(m.group(2).toLong, m.group(3).toDouble,
            m.group(5).toLong, Option(m.group(6)).filter(_.nonEmpty))).toMap
        Some((twins, intOf("batches").getOrElse(0),
          intOf("batch_size").getOrElse(0), intOf("doc_batch").getOrElse(0)))
      } finally src.close()
    }
  }

  test("every twin's max state rows sits inside its documented contract") {
    assume(artifact.isDefined, "STREAM_BENCH.json not committed yet")
    val (twins, _, batchSize, docBatch) = artifact.get
    import graft.functions.CountSketch
    // name -> (bound, the contract it encodes)
    val bounds: Map[String, (Long, String)] = Map(
      // stateless serve paths: frozen index/model, stream-static join
      // or row-local scoring — nothing may be retained
      "dsir_scored" -> ((0L, "stateless frozen-model scoring")),
      "sampled" -> ((0L, "stateless membership predicate")),
      "neardup_detections" -> ((0L, "stream-static band join")),
      "simhash_detections" -> ((0L, "stream-static simhash join")),
      "linkage_matches" -> ((0L, "stream-static variant join")),
      // the admission gate's flatMapGroupsWithState NEVER writes state
      "admission_gate" -> ((0L, "zero-retained-rows gate")),
      // r12 verdict item 4: the two apply-half twins — redaction plans
      // with NO state operator; the strip collapse never writes state
      "pii_redact" -> ((0L, "stateless row-local redaction")),
      "boiler_strip" -> ((0L, "zero-retained-rows strip collapse")),
      "incremental_excise" -> ((0L, "zero-retained-rows excision collapse")),
      // r13 verdict item 3: the composed gate->excise chain — BOTH
      // collapse stages must retain nothing
      "ingest_chain" -> ((0L, "zero-retained-rows chained gate->excise")),
      // keyed state with an explicit structural cap
      "retrieval_topk" -> ((StreamBench.RetrievalQueries.toLong,
        "one k-bounded entry list per query")),
      "anomaly" -> ((StreamBench.EventTypes.length.toLong,
        "one trailing ring per event type")),
      "offset_deltas" -> ((StreamBench.Topics.toLong * StreamBench.PartsPerTopic,
        "live topic/partition topology")),
      "asof_enrich" -> ((StreamBench.AsofUsers,
        "one last-click reference per user")),
      // sketch twins: fixed geometry regardless of stream length
      "cms_cells" -> ((CountSketch.Depth.toLong * CountSketch.Width,
        "depth x width cells")),
      "hll_registers" -> ((StreamBench.Langs.length * CountSketch.HllM,
        "langs x 2^p registers")),
      "lc_occupancy" -> ((StreamBench.Langs.length * CountSketch.LcBuckets,
        "langs x LC buckets")),
      // population / TTL-window bounds (eviction keeps these LIVE sets,
      // not history — the stronger sub-population plateau is asserted
      // separately below)
      "transitions" -> ((StreamBench.TransitionUsers,
        "TTL-evicted user population")),
      "session_rollup" -> ((2L * StreamBench.SessionUsers,
        "open sessions (+ close backlog)")),
      "curate" -> ((
        (StreamBench.CurateTtlSeconds / StreamBench.CurateSpanPerBatch + 2)
          * docBatch.toLong,
        "content hashes inside the dedup TTL window")),
      "minute_rollup" -> ((StreamBench.EventTypes.length * 8L,
        "open (type, minute) windows inside the watermark")))
    assert(twins.keySet == bounds.keySet,
      s"twin set drifted: missing ${bounds.keySet -- twins.keySet}, " +
        s"unexpected ${twins.keySet -- bounds.keySet}")
    for ((name, t) <- twins) {
      val (bound, contract) = bounds(name)
      assert(t.maxState <= bound,
        s"$name: max state rows ${t.maxState} > bound $bound ($contract)")
      assert(t.events > 0, s"$name drained no rows")
    }
    // eviction actually happened where history would otherwise pile up:
    // the TTL twins' plateaus must sit well under their total feed.
    // curate's margin is 2/3, not 1/2: since the drain samples EVERY
    // micro-batch (recentProgress, r11 ADVICE), the observed peak is the
    // transient pre-eviction window — ttl/span + 1 = 6 of 12 batches —
    // which legitimately grazes half the feed; history would be ~all of
    // it. transitions' plateau is population-bounded far below half.
    assert(twins("transitions").maxState < twins("transitions").events / 2,
      "transitions state tracked history, not the TTL window")
    assert(twins("curate").maxState < twins("curate").events * 2 / 3,
      "curate state tracked history, not the TTL window")
    // and the fixed-topology live set was fully populated
    if (batchSize >= StreamBench.Topics * StreamBench.PartsPerTopic)
      assert(twins("offset_deltas").maxState ==
        StreamBench.Topics.toLong * StreamBench.PartsPerTopic)
  }

  test("the slowest twin's throughput is annotated in-artifact") {
    // r11 verdict item 6: retrieval_topk drains 8x slower than the
    // median twin — the committed artifact must carry a one-line cause
    // note for whichever twin lands at the bottom, so the number is
    // self-explaining the way the batch sidecar's settle records are.
    // If a refresh re-orders the bottom, StreamBench.Annotations must
    // grow to cover the new slowest twin.
    assume(artifact.isDefined, "STREAM_BENCH.json not committed yet")
    val (twins, _, _, _) = artifact.get
    val (slowest, t) = twins.minBy { case (_, t) =>
      t.events / math.max(t.sec, 1e-9) }
    assert(t.note.exists(_.nonEmpty),
      s"slowest twin $slowest has no cause note in STREAM_BENCH.json")
    assert(StreamBench.Annotations.contains(slowest),
      s"slowest twin $slowest missing from StreamBench.Annotations")
  }
}
