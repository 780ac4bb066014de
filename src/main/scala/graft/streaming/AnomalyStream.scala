package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trailing-window anomaly detection — the stateful
  * counterpart of [[graft.operators.Relational.eventAnomalies]]: the
  * per-minute money stream per event type, scored against the trailing
  * `trailing` observed minutes held in a per-key ring buffer.
  *
  * State per key is the ring (<= trailing (minute, cents) longs), not
  * history; arithmetic is IDENTICAL to the batch operator — exact
  * integer sums of cents and cents^2 off the ring, then the one
  * double-division/sqrt z-score in the same operation order — so the
  * streaming verdicts equal the batch query's rows exactly (proven in
  * AnomalyStreamSpec), under the same per-key event-time ordering
  * contract as AsofStream.
  *
  * Composition: this consumes the per-minute aggregate stream (the
  * upstream tumbling-window job); chaining the two keeps each stateful
  * stage's state bounded.
  */
object AnomalyStream extends Serializable {

  case class MinuteAgg(event_type: String, minute: Long, cents: Long)
  case class Anomaly(event_type: String, minute: Long, cents: Long, z: Double)

  case class Ring(entries: Seq[Long]) // cents of the trailing minutes, oldest first

  def detect(mins: Dataset[MinuteAgg], trailing: Int = 10, minPrior: Int = 5,
             zLimit: Double = 3.0): Dataset[Anomaly] = {
    import mins.sparkSession.implicits._
    def update(key: String, it: Iterator[MinuteAgg],
               state: GroupState[Ring]): Iterator[Anomaly] = {
      var ring = state.getOption.map(_.entries).getOrElse(Seq.empty)
      val out = Seq.newBuilder[Anomaly]
      it.toSeq.sortBy(_.minute).foreach { m =>
        val k = ring.size
        if (k >= minPrior) {
          val s = ring.sum
          val ss = ring.map(c => c * c).sum
          val mean = s.toDouble / k
          val variance = math.max(ss.toDouble / k - mean * mean, 1e-6)
          val z = BigDecimal(
              (m.cents.toDouble - mean) / math.sqrt(variance))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (math.abs(z) > zLimit) out += Anomaly(key, m.minute, m.cents, z)
        }
        ring = (ring :+ m.cents).takeRight(trailing)
      }
      state.update(Ring(ring))
      out.result().iterator
    }
    mins.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
