package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stateful counterpart of
  * [[graft.operators.AsofJoin]]: a merged stream of reference rows
  * ("clicks", tag 0) and subject rows ("purchases", tag 1) per key,
  * where each subject row is emitted enriched with the latest reference
  * row at-or-before it.
  *
  * State per key is ONE row — the latest reference (ts, id, value) seen
  * so far — not a buffer of history, and it expires `ttlSeconds` of
  * EVENT time after that reference (the DocStream watermark-TTL
  * pattern): user_id is an UNBOUNDED key domain, so without expiry the
  * store would grow with every user ever seen, not live ones. The TTL
  * is the attribution horizon — a purchase more than `ttlSeconds`
  * after the user's last click attributes to nothing, which is what
  * "last touch within N" means operationally. (The batch operator has
  * no horizon; the equivalence test uses a TTL longer than the fixture
  * span, where the two definitions coincide.)
  *
  * Within a micro-batch, rows are processed in (ts, tag, id) order, so
  * a reference row at exactly the subject's timestamp is visible
  * (inclusive as-of, the batch operator's tie rule) and same-timestamp
  * reference duplicates resolve to the max id (the batch dedup rule).
  * Ordering contract: event-time order must hold ACROSS micro-batches
  * per key (within a batch any order is fine — the sort restores it).
  */
object AsofStream extends Serializable {

  /** tag 0 = reference (click), 1 = subject (purchase). */
  case class AsofEvent(user_id: Long, tus: Long, tag: Int, id: Long, value: Double)

  case class Enriched(purchase_id: Long, user_id: Long, p_ts: Long,
                      click_id: java.lang.Long, click_value: java.lang.Double,
                      gap_s: java.lang.Long)

  case class LastRef(tus: Long, id: Long, value: Double)

  def enrich(events: Dataset[AsofEvent],
             ttlSeconds: Long = 30L * 86400): Dataset[Enriched] = {
    import events.sparkSession.implicits._
    // the watermarked column must SURVIVE into the grouped dataset or
    // Spark rejects the event-time timeout (DocStream's tuple pattern)
    val withTs = events
      .withColumn("ets", timestamp_micros(col("tus")))
      .withWatermark("ets", "0 seconds")
      .select(col("user_id"), col("tus"), col("tag"), col("id"), col("value"),
        col("ets"))
      .as[(Long, Long, Int, Long, Double, java.sql.Timestamp)]
    def update(user: Long, it: Iterator[(Long, Long, Int, Long, Double, java.sql.Timestamp)],
               state: GroupState[LastRef]): Iterator[Enriched] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      val out = Seq.newBuilder[Enriched]
      it.toSeq.sortBy(e => (e._2, e._3, e._4)).foreach { e =>
        val (tus, tag, id, value) = (e._2, e._3, e._4, e._5)
        if (tag == 0) {
          val better = state.getOption.forall(s =>
            s.tus < tus || (s.tus == tus && s.id < id))
          if (better) state.update(LastRef(tus, id, value))
        } else {
          // horizon is enforced HERE, not only via state expiry: a state
          // row can outlive its horizon by one micro-batch (the timeout
          // fires only once the watermark passes ref.tus + TTL), so the
          // enrichment match re-checks the gap to keep "attributes to
          // nothing beyond ttlSeconds" exact regardless of watermark lag.
          state.getOption match {
            case Some(s) if s.tus <= tus && tus - s.tus <= ttlSeconds * 1000000L =>
              out += Enriched(id, user, tus, s.id, s.value,
                (tus - s.tus) / 1000000L)
            case _ =>
              out += Enriched(id, user, tus, null, null, null)
          }
        }
      }
      // the horizon arms off the LAST REFERENCE's event time: the state
      // row dies ttlSeconds after the click it holds (clamped one tick
      // past the watermark — Spark rejects timeouts already in the past)
      state.getOption.foreach(s =>
        state.setTimeoutTimestamp(math.max(s.tus / 1000L + ttlSeconds * 1000L,
          state.getCurrentWatermarkMs() + 1)))
      out.result().iterator
    }
    withTs.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
