package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.AnomalyStream
import graft.streaming.AnomalyStream.MinuteAgg
import graft.operators.Relational

/** Batch == stream equivalence for trailing-window anomaly detection:
  * the stateful ring-buffer scorer fed minute-ordered micro-batches
  * must produce exactly the batch operator's flagged rows (same exact
  * integer sums, same double op order, same rounding). */
class AnomalyStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming anomaly verdicts equal the batch query") {
    implicit val sq = spark.sqlContext
    val perMin = Relational.eventsWithEpoch(spark, TestSpark.Sf0001)
      .withColumn("minute", expr("epoch_s div 60"))
      .groupBy($"event_type", $"minute")
      .agg(sum(round($"value" * 100, 0).cast("long")).as("cents")) // round: the batch cents convention
      .as[MinuteAgg].collect().sortBy(m => (m.minute, m.event_type))

    val input = MemoryStream[MinuteAgg]
    val q = AnomalyStream.detect(input.toDS())
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode("append").start()
    try {
      perMin.grouped(math.max(1, perMin.length / 4 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("anomaly_out")
    val batch = Relational.eventAnomalies(
      Relational.eventsWithEpoch(spark, TestSpark.Sf0001))
    assert(batch.count() > 0, "fixture should contain anomalies")
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }
}
