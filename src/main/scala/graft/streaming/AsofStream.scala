package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stateful counterpart of
  * [[graft.operators.AsofJoin]]: a merged stream of reference rows
  * ("clicks", tag 0) and subject rows ("purchases", tag 1) per key,
  * where each subject row is emitted enriched with the latest reference
  * row at-or-before it.
  *
  * State per key is ONE row — the latest reference (ts, id, value) seen
  * so far — not a buffer of history: the state store scales with live
  * keys, exactly like OffsetStream's per-partition watermark state.
  * Within a micro-batch, rows are processed in (ts, tag, id) order, so
  * a reference row at exactly the subject's timestamp is visible
  * (inclusive as-of, the batch operator's tie rule) and same-timestamp
  * reference duplicates resolve to the max id (the batch dedup rule).
  *
  * Ordering contract: event-time order must hold ACROSS micro-batches
  * per key (within a batch any order is fine — the sort restores it).
  * A reference row arriving after a later-ts subject row was already
  * emitted cannot retroactively re-enrich it; that is the inherent
  * trade of emit-on-arrival streaming attribution. The equivalence
  * test feeds batches in event-time order and proves stream output ==
  * the batch as-of join.
  */
object AsofStream extends Serializable {

  /** tag 0 = reference (click), 1 = subject (purchase). */
  case class AsofEvent(user_id: Long, tus: Long, tag: Int, id: Long, value: Double)

  case class Enriched(purchase_id: Long, user_id: Long, p_ts: Long,
                      click_id: java.lang.Long, click_value: java.lang.Double,
                      gap_s: java.lang.Long)

  case class LastRef(tus: Long, id: Long, value: Double)

  def enrich(events: Dataset[AsofEvent]): Dataset[Enriched] = {
    import events.sparkSession.implicits._
    def update(user: Long, it: Iterator[AsofEvent],
               state: GroupState[LastRef]): Iterator[Enriched] = {
      val out = Seq.newBuilder[Enriched]
      it.toSeq.sortBy(e => (e.tus, e.tag, e.id)).foreach { e =>
        if (e.tag == 0) {
          val better = state.getOption.forall(s =>
            s.tus < e.tus || (s.tus == e.tus && s.id < e.id))
          if (better) state.update(LastRef(e.tus, e.id, e.value))
        } else {
          state.getOption match {
            case Some(s) if s.tus <= e.tus =>
              out += Enriched(e.id, user, e.tus, s.id, s.value,
                (e.tus - s.tus) / 1000000L)
            case _ =>
              out += Enriched(e.id, user, e.tus, null, null, null)
          }
        }
      }
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
