package graft.metrics

import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.atomic.DoubleAdder

/** Running count/sum of observed durations — the state behind one
  * Prometheus Summary family (the reference's topics_describe_latency /
  * groups_describe_latency, kafka_overwatch/monitoring/prometheus.py:17-28).
  * Thread-safe; rendered via MetricsExposition.summary.
  */
class LatencySummary(val name: String, val help: String) {
  private val n = new AtomicLong()
  private val s = new DoubleAdder()

  def observe(seconds: Double): Unit = { n.incrementAndGet(); s.add(seconds) }

  /** Time `body`, record its duration, return its result. */
  def time[T](body: => T): T = {
    val t0 = System.nanoTime()
    try body finally observe((System.nanoTime() - t0) / 1e9)
  }

  def count: Long = n.get()
  def sum: Double = s.sum()

  def render(labels: Seq[(String, String)] = Nil): String =
    MetricsExposition.summary(name, help, labels, count, sum)
}
