package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming first-order event transitions — the stateful face of
  * operators/Relational.eventTransitions: per user, the state is ONE
  * tiny row (the last event seen), and each micro-batch emits the
  * (prev_type, event_type) increments its new events produce. The
  * downstream aggregation to the |types|^2 matrix is a plain streaming
  * (or batch) groupBy over the increment stream.
  *
  * State is bounded two ways: one row per LIVE user (never per event),
  * and EVENT-TIME TTL eviction (the OffsetStream/DocStream pattern) — a
  * user idle past the horizon is forgotten, and their next event starts
  * a fresh chain rather than bridging a week-old gap (the same judgment
  * sessionization makes; a bridge across an eviction horizon is noise,
  * not behavior). Within a micro-batch events sort by (epoch_s,
  * event_id); ACROSS batches ordering is only guaranteed up to the
  * watermark: any event older than (max event time seen) minus
  * `watermarkDelay` is DROPPED before the stateful operator, not
  * reordered. Per-key ingest order alone is NOT sufficient with a zero
  * delay — one user's in-order-but-old event is still dropped if
  * another user's newer event already advanced the global watermark in
  * a prior micro-batch. Size `watermarkDelay` to the cross-key event-
  * time skew of the source (a partitioned log with per-partition order
  * still skews across partitions); the default 1 hour mirrors
  * DocStream's tolerance-first posture rather than assuming aligned
  * partitions.
  */
object TransitionStream {

  case class Ev(user_id: Long, epoch_s: Long, event_id: Long, event_type: String)
  /** Ev plus the event-time column — the watermark column must survive
    * into the grouped dataset for EventTimeTimeout to resolve. */
  case class EvT(user_id: Long, epoch_s: Long, event_id: Long,
                 event_type: String, ts: java.sql.Timestamp)
  case class LastSeen(epoch_s: Long, event_id: Long, event_type: String)
  case class Transition(user_id: Long, prev_type: String, event_type: String)

  def transitions(events: Dataset[Ev],
                  ttlSeconds: Long = 86400L,
                  watermarkDelay: String = "1 hour"): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val withTs = events.withColumn("ts", timestamp_seconds(col("epoch_s")))
    val src =
      (if (events.isStreaming) withTs.withWatermark("ts", watermarkDelay)
       else withTs).as[EvT]
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EvT], state: GroupState[LastSeen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.epoch_s, e.event_id))
            var prev = state.getOption
            val out = Seq.newBuilder[Transition]
            sorted.foreach { e =>
              prev.foreach(p => out += Transition(uid, p.event_type, e.event_type))
              prev = Some(LastSeen(e.epoch_s, e.event_id, e.event_type))
            }
            prev.foreach { p =>
              state.update(p)
              if (state.getCurrentWatermarkMs() >= 0)
                state.setTimeoutTimestamp(p.epoch_s * 1000L + ttlSeconds * 1000L)
            }
            out.result().iterator
          }
      }
  }
}
